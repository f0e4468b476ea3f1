"""Encoder attention + matmul-rate probes at the flagship 224² geometry.

The encoder stack is 66.7 ms/batch at B=256 vs a ~26 ms speed-of-light
(docs/PERF.md): ~half the gap is matmul efficiency (60-65% MXU), the rest
is elementwise/softmax HBM traffic.  Per block the XLA attention chain
materializes (B, H, 197, 197) f32 scores + bf16 weights ≈ 0.9 GB of HBM
round-trips — candidates to remove it:

  a) XLA attention, f32 scores (current default)
  b) XLA attention, bf16 scores (halves score traffic; numerics knob)
  c) stock Pallas TPU flash attention (jax.experimental.pallas.ops.tpu),
     L padded 197->256 with SegmentIds masking the pad keys
  d) matmul-rate reference: the MLP fc1 shape (50432, 512) x (512, 2048)
     in bf16 vs int8 (does XLA hit the v5e's 2x int8 MXU rate?)

All timing inside ONE jit (lax.scan with loop-carried operands — the axon
tunnel's ~3 ms dispatch and XLA CSE both poison per-call loops), fenced by
a host readback.

Run: python benchmarks/probe_enc_attn.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, L, DH = 256, 8, 197, 64
ITERS = 24


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3  # ms per iteration


def xla_attn(q, k, v, score_dtype):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=score_dtype)
    scores = scores * (DH ** -0.5)
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attn_suite(b, h, l, dh, tag):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, l, dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, l, dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, l, dh), jnp.bfloat16)

    def scan_attn(attn):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                out = attn(c, k, v)
                return out, ()
            out, _ = jax.lax.scan(body, q, None, length=ITERS)
            return out
        return run

    ms_f32 = timed(scan_attn(functools.partial(xla_attn,
                                               score_dtype=jnp.float32)),
                   q, k, v)
    print(f"[{tag}] xla attention, f32 scores : {ms_f32:7.3f} ms/block-attn")
    ms_bf16 = timed(scan_attn(functools.partial(xla_attn,
                                                score_dtype=jnp.bfloat16)),
                    q, k, v)
    print(f"[{tag}] xla attention, bf16 scores: {ms_bf16:7.3f} ms/block-attn")

    # --- stock pallas flash, padded to a 128 multiple ----------------------
    from mdcnet_tpu.models.layers import stock_flash_attention

    try:
        ms_flash = timed(scan_attn(stock_flash_attention), q, k, v)
        print(f"[{tag}] pallas stock flash      : {ms_flash:7.3f} "
              "ms/block-attn")
        got = np.asarray(stock_flash_attention(q, k, v).astype(jnp.float32))
        want = np.asarray(xla_attn(q, k, v, jnp.float32).astype(jnp.float32))
        print(f"  max|flash-xla| = {np.abs(got - want).max():.2e}")
    except Exception as e:
        print(f"[{tag}] pallas stock flash FAILED: {e!r}"[:300])


def main():
    attn_suite(B, H, L, DH, "224px B=256 L=197")
    attn_suite(32, 8, 1024, 64, "512px B=32 L=1024")
    key = jax.random.PRNGKey(0)

    # --- matmul rate: MLP fc1 shape, bf16 vs int8 --------------------------
    M, Kd, N = B * L, 512, 2048
    a_bf = jax.random.normal(key, (M, Kd), jnp.bfloat16)
    w_bf = jax.random.normal(jax.random.PRNGKey(3), (Kd, N), jnp.bfloat16)

    def scan_mm(dot, a, w):
        @jax.jit
        def run(a, w):
            def body(c, _):
                out = dot(c, w)
                # feed a slice back so iterations serialize (no CSE)
                c = c + out[:, :Kd].astype(c.dtype) * 0
                return c, ()
            c, _ = jax.lax.scan(body, a, None, length=ITERS)
            return c
        return run

    gflop = 2 * M * Kd * N / 1e9
    ms = timed(scan_mm(lambda a, w: jnp.dot(
        a, w, preferred_element_type=jnp.float32), a_bf, w_bf), a_bf, w_bf)
    print(f"matmul bf16 ({M}x{Kd}x{N}): {ms:7.3f} ms = "
          f"{gflop / ms:7.1f} TFLOP/s")

    a_i8 = (a_bf * 10).astype(jnp.int8)
    w_i8 = (w_bf * 10).astype(jnp.int8)
    try:
        ms = timed(scan_mm(lambda a, w: jnp.dot(
            a, w, preferred_element_type=jnp.int32), a_i8, w_i8), a_i8, w_i8)
        print(f"matmul int8 ({M}x{Kd}x{N}): {ms:7.3f} ms = "
              f"{gflop / ms:7.1f} TOP/s")
    except Exception as e:
        print(f"matmul int8 FAILED: {e!r}"[:300])


if __name__ == "__main__":
    main()
