"""Isolate the decode_block cache-update cost on the real chip.

decode_block (models/layers.py:220) writes K new K/V rows per batch row at
per-row positions with an advanced-index scatter.  TPU lowers that to a
serialized scatter; this probe times it against two scatter-free
formulations on the flagship cache geometry (B=256, H=8, L=128, Dh=128,
bf16, 8 layers x {K,V} = 16 updates per verify step):

  a) advanced-index scatter (current decode_block)
  b) one-hot matmul + select   (MXU: einsum('blk,bhkd->bhld') over K<=8)
  c) concat along L + no cache write (attention-side append; write deferred)

Run: python benchmarks/probe_block_scatter.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, L, DH = 256, 8, 128, 128


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])  # warm + fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    cache = jax.random.normal(key, (B, H, L, DH), jnp.bfloat16)
    pos = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 100)

    for K in (3, 4, 6, 8):
        new = jax.random.normal(key, (B, H, K, DH), jnp.bfloat16)

        @jax.jit
        def scatter(cache, new, pos):
            rows = jnp.arange(B)[:, None]
            cols = pos[:, None] + jnp.arange(K)[None, :]
            return cache.at[rows, :, cols].set(new.transpose(0, 2, 1, 3))

        @jax.jit
        def onehot(cache, new, pos):
            l_idx = jnp.arange(L)
            rel = l_idx[None, :] - pos[:, None]              # (B, L)
            oh = (rel[:, :, None] == jnp.arange(K)[None, None, :]
                  ).astype(cache.dtype)                      # (B, L, K)
            written = jnp.einsum("blk,bhkd->bhld", oh, new)
            in_win = ((rel >= 0) & (rel < K))[:, None, :, None]
            return jnp.where(in_win, written, cache)

        @jax.jit
        def concat(cache, new, pos):
            return jnp.concatenate([cache, new], axis=2)

        a = bench(scatter, cache, new, pos)
        b = bench(onehot, cache, new, pos)
        c = bench(concat, cache, new, pos)
        # numerics check scatter vs onehot
        eq = bool(jnp.array_equal(scatter(cache, new, pos),
                                  onehot(cache, new, pos)))
        print(f"K={K}: scatter={a:.3f} ms  onehot={b:.3f} ms  "
              f"concat={c:.3f} ms  equal={eq}  (x16 per verify step: "
              f"scatter={16*a:.1f} onehot={16*b:.1f})")


if __name__ == "__main__":
    main()
