"""Isolate the verify-block cost growth: M-scaling of the decoder's
weight-matmul chain.

Round-3 profile (docs/PERF.md): per-verify-iteration cost at K=3/4/6 is
9.0/12.8/26.6 ms vs 4.2 ms greedy, with the while body dominated by
[1024,1024]/[1024,2048] weights re-staged into VMEM in 256-row chunks.
Hypothesis: with M = B*K rows, XLA re-streams each weight matrix once per
M-chunk, so weight traffic grows ~linearly in K — and with f32 params cast
to bf16 inside the program, the stream is 4-byte.

This micro times a synthetic chain shaped like the 8-layer decoder
(~100M params: per layer 4x 1024^2 self/cross proj + 1024x2048 + 2048x1024
FFN) at M in {256, 768, 1024, 1536, 2048}, under three weight regimes:
  f32->bf16 in-program cast (today's decode path),
  bf16 pre-cast (the proposed serving fix),
  f32 matmul (control).

Run: python benchmarks/probe_weight_restage.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    D, F, L = 1024, 2048, 8
    ws = []
    for i in range(L):
        k1, k2, k3, key = jax.random.split(key, 4)
        ws.append([jax.random.normal(k1, (D, D), jnp.float32) * 0.02
                   for _ in range(4)]
                  + [jax.random.normal(k2, (D, F), jnp.float32) * 0.02,
                     jax.random.normal(k3, (F, D), jnp.float32) * 0.02])
    n_params = sum(int(np.prod(w.shape)) for lw in ws for w in lw)
    print(f"chain params: {n_params/1e6:.1f}M", file=sys.stderr)

    def chain(x, ws, wdt):
        for lw in ws:
            for w in lw[:4]:
                x = x @ w.astype(wdt)
            h = x @ lw[4].astype(wdt)
            x = jax.nn.relu(h) @ lw[5].astype(wdt)
        return x

    ws_bf16 = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), ws)

    f_cast = jax.jit(lambda x, ws: chain(x, ws, jnp.bfloat16))
    f_pre = jax.jit(lambda x, ws: chain(x, ws, jnp.bfloat16))
    f_f32 = jax.jit(lambda x, ws: chain(x, ws, jnp.float32))

    for m in (256, 1024, 1536):
        x16 = jax.random.normal(jax.random.PRNGKey(m), (m, D), jnp.bfloat16)
        x32 = x16.astype(jnp.float32)
        ms_cast = bench(f_cast, x16, ws)
        ms_pre = bench(f_pre, x16, ws_bf16)
        ms_f32 = bench(f_f32, x32, ws)
        print(f"M={m:5d}: f32cast->bf16 mm {ms_cast:7.2f}  "
              f"bf16 pre-cast {ms_pre:7.2f}  f32 mm {ms_f32:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
