"""Probe why embed (patchify conv) and finish (channel pool) cost ~28 ms
each at B=256 when their FLOPs say ~1 ms: conv-vs-reshape-matmul, f32-vs-
bf16 inputs, einsum-vs-dot, and the residual-stream dtype in the blocks.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, iters=6, k=20):
    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
    for _ in range(2):
        fence(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        fence(out)
        ts.append((time.perf_counter() - t0) / k)
    return min(ts) * 1e3


def report(name, ms):
    print(json.dumps({"part": name, "ms": round(ms, 2)}), flush=True)


B, P, D = 256, 16, 512
images = jax.random.uniform(jax.random.PRNGKey(0), (B, 224, 224, 3))
images_bf = images.astype(jnp.bfloat16)
kern = jax.random.normal(jax.random.PRNGKey(1), (P, P, 3, D),
                         jnp.bfloat16) * 0.02
wmat = kern.reshape(P * P * 3, D)

# --- patchify variants ---
conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
    x.astype(jnp.bfloat16), k, (P, P), "VALID",
    dimension_numbers=("NHWC", "HWIO", "NHWC")))
report("conv_f32_in", timed(lambda: conv(images, kern)))
report("conv_bf16_in", timed(lambda: conv(images_bf, kern)))


def patch_matmul(x, w):
    x = x.astype(jnp.bfloat16)
    b = x.shape[0]
    x = x.reshape(b, 14, P, 14, P, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 196, P * P * 3)
    return x @ w


pm = jax.jit(patch_matmul)
report("reshape_matmul_f32_in", timed(lambda: pm(images, wmat)))
report("reshape_matmul_bf16_in", timed(lambda: pm(images_bf, wmat)))

# --- channel pool variants ---
from mdcnet_tpu.models.vit import adaptive_pool_matrix

x32 = jax.random.normal(jax.random.PRNGKey(2), (B, 197, D))
xbf = x32.astype(jnp.bfloat16)
pool = jnp.asarray(adaptive_pool_matrix(D, 1024), jnp.bfloat16)

ein = jax.jit(lambda x, m: jnp.einsum(
    "...d,de->...e", x[:, 1:].astype(jnp.bfloat16), m))
report("pool_einsum_f32_in", timed(lambda: ein(x32, pool)))
report("pool_einsum_bf16_in", timed(lambda: ein(xbf, pool)))
dot = jax.jit(lambda x, m: x[:, 1:].astype(jnp.bfloat16) @ m)
report("pool_matmul_bf16_in", timed(lambda: dot(xbf, pool)))

# is the 28 ms actually the f32 HBM read? raw pass over the same bytes:
passthru = jax.jit(lambda x: x.astype(jnp.bfloat16).sum(axis=(1, 2)))
report("f32_read_reduce", timed(lambda: passthru(x32)))
report("images_f32_read_reduce", timed(lambda: passthru(
    images.reshape(B, -1, 3))))

# --- block residual dtype ---
from mdcnet_tpu.models.vit import ViTBlock

for resid, xin in [("f32", None), ("bf16", None)]:
    blk = ViTBlock(D, 8, 4.0, 1e-6, fuse_qkv=True, dtype=jnp.bfloat16,
                   param_dtype=jnp.float32)
    xt = xbf if resid == "bf16" else x32
    bp = blk.init(jax.random.PRNGKey(3), xt[:1])
    if resid == "bf16":
        # cast the layerscale gammas to bf16 so the residual stays bf16
        bp = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), bp)

    @jax.jit
    def stack(p, x):
        for _ in range(12):
            x = blk.apply(p, x)
        return x

    report(f"block_stack_resid_{resid}", timed(lambda: stack(bp, xt)))
