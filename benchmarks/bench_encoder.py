"""Encoder dissection benchmark (flagship geometry, B=256 by default).

Times the ViT forward and its parts so the hot spot is a measurement, not a
guess: embed / block stack / bottleneck, attention-only and MLP-only
stacks, exact vs tanh GELU, flash vs XLA attention, and the decoder
cross-attention prefill.  One JSON line per row.

All timings fence with a device->host readback (block_until_ready does not
synchronize over the axon tunnel).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, iters=5, k=20):
    """Per-call device time with the tunnel overheads amortized away.

    Tunnel facts that shape this: (a) the only fence is a device->host
    readback and its round trip is ~28 ms — fencing every call swamps any
    sub-30ms kernel, so dispatch ``k`` calls back-to-back (device executions
    serialize) and fence ONCE; (b) the fence readback must be one element
    sliced ON DEVICE (np.asarray of the full output pulls 205 MB); (c) the
    first 1-2 executions of a program can be 100x slower (server warm-up).
    """
    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])

    for _ in range(2):
        fence(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        fence(out)
        times.append((time.perf_counter() - t0) / k)
    return float(np.min(times))


def report(name, ms, batch, **kw):
    print(json.dumps({"part": name, "ms": round(ms * 1e3, 2),
                      "img_per_s": round(batch / ms, 1), **kw}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--parts", default="all",
                    help="comma list: full,gelu,flash,stages,sublayers,"
                    "padded,prefill,attnimpl")
    args = ap.parse_args()
    parts = set(args.parts.split(","))
    want = lambda p: "all" in parts or p in parts

    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.models.vit import ViTEncoder

    cfg = large_preset().model
    B = args.batch
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (B, cfg.img_size, cfg.img_size, 3))

    def enc(**over):
        kw = dict(patch_size=cfg.patch_size, img_size=cfg.img_size,
                  dim=cfg.enc_dim, depth=cfg.enc_depth,
                  num_heads=cfg.enc_heads, mlp_ratio=cfg.enc_mlp_ratio,
                  layerscale_init=cfg.enc_layerscale_init,
                  out_dim=cfg.enc_out_dim, use_cls_token=cfg.enc_cls_token,
                  fuse_qkv=cfg.enc_fuse_qkv,  # production default
                  dtype=jnp.dtype(cfg.dtype),
                  param_dtype=jnp.dtype(cfg.param_dtype))
        kw.update(over)
        return ViTEncoder(**kw)

    base = enc()
    params = jax.jit(base.init)(jax.random.PRNGKey(1), images[:1])

    if want("full") or want("gelu") or want("flash"):
        f = jax.jit(lambda p, x: base.apply(p, x))
        report("encoder_full_exact_gelu", timed(lambda: f(params, images),
                                                args.iters), B)
    if want("gelu"):
        m = enc(gelu_approx=True)
        f = jax.jit(lambda p, x: m.apply(p, x))
        report("encoder_full_tanh_gelu", timed(lambda: f(params, images),
                                               args.iters), B)
    if want("flash"):
        m = enc(use_flash=True)
        f = jax.jit(lambda p, x: m.apply(p, x))
        report("encoder_full_flash", timed(lambda: f(params, images),
                                           args.iters), B)
    if want("fuse"):
        m = enc(fuse_qkv=True)
        f = jax.jit(lambda p, x: m.apply(p, x))
        report("encoder_full_fused_qkv", timed(lambda: f(params, images),
                                               args.iters), B)
    if want("scan"):
        m = enc(scan_blocks=True, fuse_qkv=True)
        f = jax.jit(lambda p, x: m.apply(p, x))
        report("encoder_full_scan_fused", timed(lambda: f(params, images),
                                                args.iters), B)
    if want("combo"):
        m = enc(fuse_qkv=True, gelu_approx=True)
        f = jax.jit(lambda p, x: m.apply(p, x))
        report("encoder_full_fused_tanh", timed(lambda: f(params, images),
                                                args.iters), B)
    if want("attnimpl"):
        for impl in ("bf16", "flash"):
            m = enc(attn_impl=impl)
            f = jax.jit(lambda p, x, m=m: m.apply(p, x))
            report(f"encoder_full_attn_{impl}",
                   timed(lambda: f(params, images), args.iters), B)
        m = enc(attn_impl="flash", gelu_approx=True)
        f = jax.jit(lambda p, x: m.apply(p, x))
        report("encoder_full_attn_flash_tanh",
               timed(lambda: f(params, images), args.iters), B)

    if want("stages"):
        f_embed = jax.jit(lambda p, x: base.apply(p, x, method="embed"))
        x_tok = f_embed(params, images)
        f_blocks = jax.jit(lambda p, x: base.apply(p, x,
                                                   method="run_blocks"))
        x_out = f_blocks(params, x_tok)
        f_fin = jax.jit(lambda p, x: base.apply(p, x, method="finish"))
        report("embed", timed(lambda: f_embed(params, images), args.iters), B)
        report("blocks", timed(lambda: f_blocks(params, x_tok), args.iters),
               B)
        report("finish", timed(lambda: f_fin(params, x_out), args.iters), B)

    if want("sublayers"):
        # attention-only / MLP-only stacks at block geometry
        from mdcnet_tpu.models.vit import ViTBlock

        import flax.linen as nn

        class AttnOnly(ViTBlock):
            @nn.compact
            def __call__(self, x):
                kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
                from mdcnet_tpu.models.layers import MultiHeadAttention
                h = nn.LayerNorm(epsilon=1e-6, **kw, name="norm1")(x)
                h = MultiHeadAttention(self.dim, self.num_heads, **kw,
                                       name="attn")(h, h, h)
                return x + h

        class MlpOnly(ViTBlock):
            @nn.compact
            def __call__(self, x):
                kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
                h = nn.LayerNorm(epsilon=1e-6, **kw, name="norm2")(x)
                h = nn.Dense(int(self.dim * self.mlp_ratio), **kw,
                             name="mlp_fc1")(h)
                h = nn.gelu(h, approximate=self.gelu_approx)
                h = nn.Dense(self.dim, **kw, name="mlp_fc2")(h)
                return x + h

        n_tok = (cfg.img_size // cfg.patch_size) ** 2 + 1
        x_tok = jax.random.normal(jax.random.PRNGKey(2),
                                  (B, n_tok, cfg.enc_dim),
                                  jnp.dtype(cfg.dtype))
        for name, cls in [("attn_stack", AttnOnly), ("mlp_stack", MlpOnly)]:
            block = cls(cfg.enc_dim, cfg.enc_heads, cfg.enc_mlp_ratio,
                        dtype=jnp.dtype(cfg.dtype),
                        param_dtype=jnp.dtype(cfg.param_dtype))
            bp = block.init(jax.random.PRNGKey(3), x_tok[:1])

            @jax.jit
            def stack(p, x):
                for _ in range(cfg.enc_depth):
                    x = block.apply(p, x)
                return x

            report(name, timed(lambda: stack(bp, x_tok), args.iters), B,
                   layers=cfg.enc_depth)

    if want("padded"):
        # does padding tokens 197 -> 256 change block-stack time? (the
        # attention key dim pads to 256 lanes either way)
        for n_tok in (197, 200, 256):
            x_tok = jax.random.normal(jax.random.PRNGKey(2),
                                      (B, n_tok, cfg.enc_dim),
                                      jnp.dtype(cfg.dtype))
            f_blocks = jax.jit(lambda p, x: base.apply(
                p, x, method="run_blocks"))
            report(f"blocks_n{n_tok}",
                   timed(lambda: f_blocks(params, x_tok), args.iters), B)

    if want("prefill"):
        model = build_model(cfg)
        full_params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(1)}, images[:1],
            jnp.zeros((1, 10), jnp.int32))
        f_enc = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
        enc_out = f_enc(full_params, images)
        f_pre = jax.jit(lambda p, e: model.apply(
            p, e, method=lambda m, e: m.decoder.prepare_memory(e)))
        report("encode", timed(lambda: f_enc(full_params, images),
                               args.iters), B)
        report("prefill_memory", timed(lambda: f_pre(full_params, enc_out),
                                       args.iters), B)


if __name__ == "__main__":
    main()
