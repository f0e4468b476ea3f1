"""Flash attention A/B at the 512² streaming geometry (L = 1024 patches).

VERDICT round-2 weak item 6: the Pallas flash kernel must either win on the
long-sequence config or stop being a headline feature.  This measures the
streaming-preset encoder (patch 16 @ 512² -> 1024 tokens) forward AND a
training value+grad step, use_flash False vs True, and prints one JSON line
per cell.

Run: python benchmarks/bench_flash.py [--batch 32] [--iters 5]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(fn, iters):
    fence(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from mdcnet_tpu.config import streaming_preset
    from mdcnet_tpu.models.vit import ViTEncoder

    cfg = streaming_preset().model
    B = args.batch
    images = jax.random.uniform(
        jax.random.PRNGKey(0), (B, cfg.img_size, cfg.img_size, 3))

    def enc(use_flash):
        return ViTEncoder(
            patch_size=cfg.patch_size, img_size=cfg.img_size,
            dim=cfg.enc_dim, depth=cfg.enc_depth, num_heads=cfg.enc_heads,
            mlp_ratio=cfg.enc_mlp_ratio,
            layerscale_init=cfg.enc_layerscale_init, out_dim=cfg.enc_out_dim,
            use_cls_token=cfg.enc_cls_token, fuse_qkv=cfg.enc_fuse_qkv,
            scan_blocks=cfg.enc_scan_blocks, use_flash=use_flash,
            dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.dtype(cfg.param_dtype))

    base = enc(False)
    params = jax.jit(base.init)(jax.random.PRNGKey(1), images[:1])
    n_tokens = (cfg.img_size // cfg.patch_size) ** 2

    def cell(name, fn):
        try:
            ms = timed(fn, args.iters)
            print(json.dumps({"part": name, "L": n_tokens, "batch": B,
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:  # OOM at this geometry is itself a result
            msg = str(e)
            oom = "memory" in msg.lower() or "hbm" in msg.lower()
            print(json.dumps({"part": name, "L": n_tokens, "batch": B,
                              "error": "OOM" if oom else msg[:120]}),
                  flush=True)

    for flash in (False, True):
        m = enc(flash)
        fwd = jax.jit(lambda p, x, m=m: m.apply(p, x))
        cell(f"streaming_fwd_flash={flash}", lambda: fwd(params, images))

        def loss(p, x, m=m):
            return jnp.mean(jnp.square(m.apply(p, x)))

        step = jax.jit(jax.value_and_grad(loss))
        cell(f"streaming_grad_flash={flash}", lambda: step(params, images))


if __name__ == "__main__":
    main()
