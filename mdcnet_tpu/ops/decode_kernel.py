"""Fused int8 decode-attention Pallas kernel.

Why this exists: autoregressive decode on the flagship geometry reads
~2.5 GB of K/V per step at B=256 (self caches + the constant cross-attention
memory) — the decode loop is bandwidth-bound.  Int8 storage halves those
bytes, but XLA materializes ``int8 -> f32`` converts in HBM before its dots,
giving back everything saved (measured: 535 img/s bf16 vs 535 img/s "fused"
jnp int8).  This kernel dequantizes *in VMEM*: HBM only ever sees int8
values + f32 per-position scales.

One kernel serves both attention forms in a decode step:
  self-attention : L = cache length, keys masked to positions <= pos
  cross-attention: L = encoder length (196 padded to 200), pos = 195

Design (learned the hard way — see docs/PERF.md):
  - inputs are grid-blocked VMEM BlockSpecs over flattened (B/t, t*H) tiles,
    so Pallas double-buffers the HBM->VMEM copies across grid programs
    automatically (a manual DMA start/wait version ran 3x slower than XLA);
  - the kernel body is pure full-extent compute — no dynamic slicing, no
    partial-lane/sublane loads, hence no Mosaic alignment proofs;
  - scales fold into the score matrix (K) and softmax weights (V); masked
    and padded positions are hard-zeroed so garbage can never leak.

Numerics match the jnp reference (tests/test_decode_kernel.py, interpret
mode on CPU; compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdcnet_tpu.ops.kv_quant import QuantKV

NEG_INF = -1e30


def _kernel(pos_ref, q_ref, kv_ref, ks_ref, vv_ref, vs_ref, o_ref, *,
            scale: float):
    pos = pos_ref[0]
    q = q_ref[0].astype(jnp.float32) * scale                 # (N, D)
    k = kv_ref[0].astype(jnp.float32)                         # (N, L, D)
    ks = ks_ref[0]                                            # (N, L)
    n, length = ks.shape

    l_ids = jax.lax.broadcasted_iota(jnp.int32, (n, length), 1)
    valid = l_ids <= pos

    s = jnp.sum(q[:, None, :] * k, axis=-1) * ks              # (N, L)
    s = jnp.where(valid, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    w = jnp.exp(s)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = w * vs_ref[0]                                         # fold V scales
    w = jnp.where(valid, w, 0.0)                              # NaN-proof tail

    v = vv_ref[0].astype(jnp.float32)                         # (N, L, D)
    o_ref[0] = jnp.sum(w[:, :, None] * v, axis=1).astype(o_ref.dtype)


def fused_int8_decode_attention(q: jnp.ndarray, k: QuantKV, v: QuantKV,
                                pos, block_l: int = 128,
                                batch_tile: int = 4,
                                interpret: Optional[bool] = None
                                ) -> jnp.ndarray:
    """q: (B, H, D) -> (B, H, D) attending over int8 K/V up to ``pos``.

    k/v: QuantKV with values (B, H, L, D) int8 and scale (B, H, L, 1) f32.
    ``block_l`` is unused (kept for call-site compatibility); the kernel
    reads each tile's full L extent and relies on grid pipelining.
    """
    b, h, d = q.shape
    cache_len = k.values.shape[2]
    batch_tile = min(batch_tile, b)
    while b % batch_tile:
        batch_tile //= 2
    scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pos_arr = jnp.full((1,), pos, jnp.int32)
    ks = k.scale[..., 0]   # (B, H, L) f32
    vs = v.scale[..., 0]

    n = batch_tile * h     # rows per grid program

    def flat(x, tail):
        return x.reshape((b // batch_tile, n) + tail)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // batch_tile,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cache_len, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cache_len), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cache_len, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cache_len), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b // batch_tile, n, d), q.dtype),
        interpret=interpret,
    )(pos_arr, flat(q, (d,)), flat(k.values, (cache_len, d)),
      flat(ks, (cache_len,)), flat(v.values, (cache_len, d)),
      flat(vs, (cache_len,)))
    return out.reshape(b, h, d)
