"""Pallas TPU attention kernels.

Two kernels serve the framework's hot paths:

  flash_attention   — blockwise online-softmax attention for full sequences
                      (encoder self-attention; scales to the 512² streaming
                      config where L = 1024 patches and the naive score
                      matrix stops fitting VMEM comfortably).  Forward is a
                      Pallas kernel; backward falls back to the XLA
                      reference implementation via custom_vjp (recompute),
                      so the op is trainable everywhere.

  decode_attention  — single-position cached attention for autoregressive
                      decode: q (B, H, D) against K/V caches (B, H, L, D),
                      reading ONLY ceil((pos+1)/BLOCK) key blocks per step
                      (the XLA path reads the full cache each step).  The
                      current position arrives as a scalar-prefetch operand
                      so block DMAs are predicated on it.

Both match the jnp reference to float32 tolerance (tests/test_pallas.py,
interpret mode on CPU; compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# Reference (XLA) attention — also the custom-VJP backward path
# --------------------------------------------------------------------------
def reference_attention(q, k, v, bias=None, causal=False):
    """q/k/v: (B, H, L, D). bias: broadcastable to (B, H, Lq, Lk)."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (dh ** -0.5)
    if causal:
        lq, lk = s.shape[-2], s.shape[-1]
        mask = jnp.arange(lk)[None, :] > jnp.arange(lq)[:, None]
        s = jnp.where(mask, NEG_INF, s)
    if bias is not None:
        s = s + bias
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------------------
# flash attention (forward Pallas kernel, recompute backward)
# --------------------------------------------------------------------------
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_k: int,
                  causal: bool, scale: float, block_q: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale      # (block_q, D)

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    num_k = _cdiv(seq_k, block_k)
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k)].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k)].astype(jnp.float32)
        s = q @ k.T                                # (block_q, block_k)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            s = jnp.where(k_pos > q_pos, NEG_INF, s)
        s = jnp.where(k_pos < seq_k, s, NEG_INF)   # tail padding
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + p @ v
        return m_new, l, acc

    if causal:
        # skip key blocks entirely above the causal diagonal
        num_k_dyn = jnp.minimum(num_k, ((qi + 1) * block_q + block_k - 1)
                                // block_k)
    else:
        num_k_dyn = num_k
    m, l, acc = jax.lax.fori_loop(0, num_k_dyn, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, causal: bool, block_q: int, block_k: int):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, max(lq, 8))
    block_k = min(block_k, max(lk, 8))
    scale = d ** -0.5

    # pad sequence dims to block multiples; the kernel masks k_pos >= seq_k
    # and padded q rows are sliced away below
    lq_pad = _cdiv(lq, block_q) * block_q
    lk_pad = _cdiv(lk, block_k) * block_k
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
    grid = (b * h, _cdiv(lq, block_q))

    qr = q.reshape(b * h, lq_pad, d)
    kr = k.reshape(b * h, lk_pad, d)
    vr = v.reshape(b * h, lk_pad, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, seq_k=lk,
                          causal=causal, scale=scale, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qr, kr, vr)
    return out[:, :lq].reshape(b, h, lq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, causal: bool = False, block_q: int = 128,
                    block_k: int = 128):
    """Blockwise attention, numerically equal to reference_attention
    (softmax in f32).  q/k/v: (B, H, L, D) with D a multiple of 128."""
    return _flash_forward(q, k, v, causal, block_q, block_k)


def _flash_fwd(q, k, v, causal, block_q, block_k):
    return _flash_forward(q, k, v, causal, block_q, block_k), (q, k, v)


def _flash_bwd(causal, block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: reference_attention(a, b, c,
                                                         causal=causal),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------------------------------------
# cached decode attention (length-aware K/V reads)
# --------------------------------------------------------------------------
def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, pos: jnp.ndarray,
                     block_k: int = 16) -> jnp.ndarray:
    """Cached single-position attention (bf16, manual DMA).

    NOTE: superseded by ops/decode_kernel.fused_int8_decode_attention for
    the production decode path; this variant's manual per-program DMA is
    measurably slower than grid-pipelined blocks (docs/PERF.md) and its
    dynamic-offset copies require the DMA-alignment care documented there.
    Kept as the simplest skip-unused-cache-blocks exemplar, tested in
    interpret mode.

    q: (B, H, D); k_cache/v_cache: (B, H, L, D); pos: scalar int32 (current
    position; keys at indices > pos are masked and never copied from HBM).
    Returns (B, H, D).
    """
    b, h, d = q.shape
    cache_len = k_cache.shape[2]
    scale = d ** -0.5
    pos_arr = jnp.full((1,), pos, jnp.int32)
    total_blocks = _cdiv(cache_len, block_k)

    def kernel(pos_ref, q_ref, k_hbm, v_hbm, o_ref, k_vmem, v_vmem, sem):
        p = pos_ref[0]
        blocks_needed = (p + block_k) // block_k  # ceil((p+1)/block_k)

        def copy_loop(i, carry):
            @pl.when(i < blocks_needed)
            def _():
                dk = pltpu.make_async_copy(
                    k_hbm.at[0, :, pl.ds(i * block_k, block_k)],
                    k_vmem.at[:, pl.ds(i * block_k, block_k)], sem.at[0])
                dv = pltpu.make_async_copy(
                    v_hbm.at[0, :, pl.ds(i * block_k, block_k)],
                    v_vmem.at[:, pl.ds(i * block_k, block_k)], sem.at[1])
                dk.start()
                dv.start()
                dk.wait()
                dv.wait()
            return carry

        jax.lax.fori_loop(0, total_blocks, copy_loop, 0)

        qv = q_ref[0].astype(jnp.float32) * scale          # (H, D)
        k = k_vmem[...].astype(jnp.float32)                 # (H, L, D)
        v = v_vmem[...].astype(jnp.float32)
        l_pos = jax.lax.broadcasted_iota(jnp.int32, (h, cache_len), 1)
        # un-copied scratch holds garbage (possibly NaN): hard-zero it
        valid = (l_pos <= p)[:, :, None]
        k = jnp.where(valid, k, 0.0)
        v = jnp.where(valid, v, 0.0)
        s = jnp.sum(qv[:, None, :] * k, axis=-1)            # (H, L)
        s = jnp.where(l_pos <= p, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp(s)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        o_ref[0] = jnp.sum(w[:, :, None] * v, axis=1).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, cache_len, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((1, h, cache_len, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, cache_len, d), k_cache.dtype),
            pltpu.VMEM((h, cache_len, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(pos_arr, q, k_cache, v_cache)
