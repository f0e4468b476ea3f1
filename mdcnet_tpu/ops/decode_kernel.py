"""Fused int8 decode-attention Pallas kernel.

Why this exists: autoregressive decode on the flagship geometry reads
~2.5 GB of K/V per step at B=256 (self caches + the constant cross-attention
memory) — the decode loop is bandwidth-bound.  Int8 storage halves those
bytes, but XLA materializes ``int8 -> f32`` converts in HBM before its dots,
giving back everything saved (measured: 535 img/s bf16 vs 535 img/s "fused"
jnp int8).  This kernel performs the dequantization *in VMEM*: HBM only ever
sees int8 values + f32 per-position scales.

One kernel serves both attention forms in a decode step:
  self-attention : L = cache length, keys masked to positions <= pos
  cross-attention: L = encoder length (196), pos = L-1 (no masking)

Layout per grid program (one batch tile):
  q (Bt, H, D) VMEM  — current position's queries
  k/v int8 (Bt, H, L, D) + scales (Bt, H, L) in ANY memory, DMA'd per tile
  per-head MXU matmuls: scores = q_h @ k_h^T (contract D), out = w_h @ v_h

Numerics match the jnp reference (tests/test_decode_kernel.py, interpret
mode on CPU; compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdcnet_tpu.ops.kv_quant import QuantKV

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(pos_ref, q_ref, kv_ref, ks_ref, vv_ref, vs_ref, o_ref,
            k_vmem, ks_vmem, v_vmem, vs_vmem, s_vmem, sem, *, block_l: int,
            cache_len: int, heads: int, head_dim: int, scale: float):
    pos = pos_ref[0]
    tile = pl.program_id(0)
    blocks_needed = (pos + block_l) // block_l  # ceil((pos+1)/block_l)
    full_blocks = cache_len // block_l
    tail = cache_len - full_blocks * block_l    # static remainder

    def copy_at(sl):
        # k/v/scale live unblocked in ANY memory; slice this program's tile
        copies = [
            pltpu.make_async_copy(kv_ref.at[tile, :, sl], k_vmem.at[:, sl],
                                  sem.at[0]),
            pltpu.make_async_copy(ks_ref.at[tile, :, sl], ks_vmem.at[:, sl],
                                  sem.at[1]),
            pltpu.make_async_copy(vv_ref.at[tile, :, sl], v_vmem.at[:, sl],
                                  sem.at[2]),
            pltpu.make_async_copy(vs_ref.at[tile, :, sl], vs_vmem.at[:, sl],
                                  sem.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    def copy_loop(i, carry):
        @pl.when(i < blocks_needed)
        def _():
            copy_at(pl.ds(i * block_l, block_l))
        return carry

    jax.lax.fori_loop(0, full_blocks, copy_loop, 0)
    if tail:
        @pl.when(blocks_needed > full_blocks)
        def _():
            copy_at(pl.ds(full_blocks * block_l, tail))

    n = heads  # flattened (batch_tile * H) rows, one query vector each
    q = q_ref[0].astype(jnp.float32) * scale                     # (N, D)
    padded_len = k_vmem.shape[1]                                 # block multiple
    total_blocks = padded_len // block_l

    # scores (N, Lp), computed block-by-block so the dequantized f32 K block
    # never exceeds a few MB of VMEM; staged through a VMEM scratch because
    # Mosaic has no value-level dynamic_update_slice
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (n, padded_len), 1)

    def score_block(i, carry):
        sl = pl.ds(pl.multiple_of(i * block_l, block_l), block_l)
        k_blk = k_vmem[:, sl].astype(jnp.float32)                # (N, bl, D)
        s_blk = jnp.sum(q[:, None, :] * k_blk, axis=-1)          # (N, bl)
        s_vmem[:, sl] = s_blk * ks_vmem[:, sl]
        return carry

    jax.lax.fori_loop(0, total_blocks, score_block, 0)
    scores = s_vmem[...]
    scores = jnp.where(l_ids <= pos, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = w * vs_vmem[...]                                          # fold V scales
    # un-copied scratch beyond pos may hold NaN scales: hard-zero the tail
    w = jnp.where(l_ids <= pos, w, 0.0)
    s_vmem[...] = w  # reuse the scratch so blocks can be ref-sliced

    def out_block(i, acc):
        sl = pl.ds(pl.multiple_of(i * block_l, block_l), block_l)
        v_blk = v_vmem[:, sl].astype(jnp.float32)                # (N, bl, D)
        w_blk = s_vmem[:, sl]
        return acc + jnp.sum(w_blk[:, :, None] * v_blk, axis=1)

    out = jax.lax.fori_loop(0, total_blocks, out_block,
                            jnp.zeros((n, head_dim), jnp.float32))
    o_ref[0] = out.astype(o_ref.dtype)


def fused_int8_decode_attention(q: jnp.ndarray, k: QuantKV, v: QuantKV,
                                pos, block_l: int = 128,
                                batch_tile: int = 8,
                                interpret: Optional[bool] = None
                                ) -> jnp.ndarray:
    """q: (B, H, D) -> (B, H, D) attending over int8 K/V up to ``pos``.

    k/v: QuantKV with values (B, H, L, D) int8 and scale (B, H, L, 1) f32.
    """
    b, h, d = q.shape
    cache_len = k.values.shape[2]
    batch_tile = min(batch_tile, b)
    while b % batch_tile:
        batch_tile //= 2
    block_l = min(block_l, cache_len)
    padded_len = _cdiv(cache_len, block_l) * block_l
    scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pos_arr = jnp.full((1,), pos, jnp.int32)
    ks = k.scale[..., 0]   # (B, H, L)
    vs = v.scale[..., 0]

    # head-major per-tile views so per-head slices are contiguous
    def tile_spec(shape_tail, space):
        return pl.BlockSpec((batch_tile,) + shape_tail,
                            lambda i, *_: (i,) + (0,) * len(shape_tail),
                            memory_space=space)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // batch_tile,),
        in_specs=[
            pl.BlockSpec((1, h * batch_tile, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # TPU lowering requires ANY-space inputs to stay unblocked; the
            # kernel slices its tile via program_id
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, h * batch_tile, d),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h * batch_tile, padded_len, d), jnp.int8),
            pltpu.VMEM((h * batch_tile, padded_len), jnp.float32),
            pltpu.VMEM((h * batch_tile, padded_len, d), jnp.int8),
            pltpu.VMEM((h * batch_tile, padded_len), jnp.float32),
            pltpu.VMEM((h * batch_tile, padded_len), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    # flatten (B, H) -> (B/t, t*H) so one grid program owns a whole tile
    def flat(x, tail):
        return x.reshape((b // batch_tile, batch_tile * h) + tail)

    kernel = functools.partial(
        _kernel, block_l=block_l, cache_len=cache_len,
        heads=batch_tile * h, head_dim=d, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b // batch_tile, batch_tile * h, d),
                                       q.dtype),
        interpret=interpret,
    )(pos_arr, flat(q, (d,)), flat(k.values, (cache_len, d)),
      flat(ks, (cache_len,)), flat(v.values, (cache_len, d)),
      flat(vs, (cache_len,)))
    return out.reshape(b, h, d)
