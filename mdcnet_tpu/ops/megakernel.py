"""Whole-step decode megakernel: all decoder layers in ONE pallas_call.

Why: autoregressive decode on the flagship geometry is HBM-bandwidth-bound
(~2.75 GB/step bf16 at B=256; docs/PERF.md).  Int8 K/V halves the bytes, but
round 1 showed per-attention Pallas calls (16/step) lose more to fixed costs
than quantization saves.  This kernel runs the ENTIRE 8-layer decode step in
one call:

  - grid = (num_layers,): per-layer weights arrive via pipelined BlockSpecs
    (next layer's weights prefetch during the current layer's compute);
  - activations for the whole batch live in VMEM scratch across grid steps
    (B x D f32 = 1 MB) — they never touch HBM between layers;
  - int8 K/V caches stay in HBM (memory_space=ANY) and are streamed in
    CHUNK-sized batch slices with double-buffered manual DMA, overlapping
    each chunk's attention with the next chunk's fetch;
  - the self-attention chunk loop skips cache blocks beyond ``pos`` — early
    decode steps read only the live triangle of the cache, not the full
    budget rectangle;
  - attention contractions run on the MXU in int8: q (and the post-softmax
    weight rows) are quantized per-row so score/output dots are
    int8 x int8 -> int32, with f32 per-row/per-key scales folded on the VPU
    (whose per-step element load is ~100x smaller than the dots') —
    K/V bytes are never converted to wide types at all;
  - the current token's K/V never round-trips: it is quantized in-kernel,
    attended in-register, and emitted for the caller to append to the cache
    (one dynamic_update_slice across all layers in XLA).

The kernel serves the ``kv_quant`` fast path of generation.  The bf16 XLA
path remains the parity-exact default (config.kv_quant=False).

Reference workload being accelerated: inference_p.py:69-115 generation
semantics (greedy/top-k sampling loop over a 101-step budget).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


class StackedDecoder(NamedTuple):
    """Per-layer weights stacked on a leading layer axis (bf16 except LN)."""
    wqkv: jnp.ndarray    # (L, D, 3D)  self q|k|v packed
    bqkv: jnp.ndarray    # (L, 1, 3D)
    wo_s: jnp.ndarray    # (L, D, D)
    bo_s: jnp.ndarray    # (L, 1, D)
    wq_c: jnp.ndarray    # (L, D, D)
    bq_c: jnp.ndarray    # (L, 1, D)
    wo_c: jnp.ndarray    # (L, D, D)
    bo_c: jnp.ndarray    # (L, 1, D)
    w1: jnp.ndarray      # (L, D, F)
    b1: jnp.ndarray      # (L, 1, F)
    w2: jnp.ndarray      # (L, F, D)
    b2: jnp.ndarray      # (L, 1, D)
    ln: jnp.ndarray      # (L, 8, D) f32: ln1 s,b | ln2 s,b | ln3 s,b | pad


def stack_decoder_weights(dec_params: Dict[str, Any], num_layers: int,
                          dtype=jnp.bfloat16) -> StackedDecoder:
    """Stack flax per-layer decoder params (models/decoder.py setup naming)
    into the megakernel layout.  Run once per generation call (the stack is
    jit-cached alongside the KV prefill)."""
    def get(i, *path):
        node = dec_params[f"layer{i}"]
        for p in path:
            node = node[p]
        return node

    def stacked(*path, cast=True):
        arrs = [jnp.asarray(get(i, *path)) for i in range(num_layers)]
        out = jnp.stack(arrs)
        return out.astype(dtype) if cast else out

    wq = stacked("self_attn", "q_proj", "kernel")
    wk = stacked("self_attn", "k_proj", "kernel")
    wv = stacked("self_attn", "v_proj", "kernel")
    bq = stacked("self_attn", "q_proj", "bias")
    bk = stacked("self_attn", "k_proj", "bias")
    bv = stacked("self_attn", "v_proj", "bias")
    ln_rows = []
    for i in range(num_layers):
        rows = [get(i, "norm1", "scale"), get(i, "norm1", "bias"),
                get(i, "norm2", "scale"), get(i, "norm2", "bias"),
                get(i, "norm3", "scale"), get(i, "norm3", "bias")]
        d = rows[0].shape[0]
        rows += [jnp.zeros((d,), jnp.float32)] * 2
        ln_rows.append(jnp.stack([r.astype(jnp.float32) for r in rows]))
    return StackedDecoder(
        wqkv=jnp.concatenate([wq, wk, wv], axis=-1),
        bqkv=jnp.concatenate([bq, bk, bv], axis=-1)[:, None, :],
        wo_s=stacked("self_attn", "out_proj", "kernel"),
        bo_s=stacked("self_attn", "out_proj", "bias")[:, None, :],
        wq_c=stacked("cross_attn", "q_proj", "kernel"),
        bq_c=stacked("cross_attn", "q_proj", "bias")[:, None, :],
        wo_c=stacked("cross_attn", "out_proj", "kernel"),
        bo_c=stacked("cross_attn", "out_proj", "bias")[:, None, :],
        w1=stacked("linear1", "kernel"),
        b1=stacked("linear1", "bias")[:, None, :],
        w2=stacked("linear2", "kernel"),
        b2=stacked("linear2", "bias")[:, None, :],
        ln=jnp.stack(ln_rows),
    )


class StackedKV(NamedTuple):
    """Stacked int8 cache: one array per K/V across all layers."""
    k: jnp.ndarray        # (L, B, H, Lc, Dh) int8
    k_scale: jnp.ndarray  # (L, B, H, Sc) f32, Sc = Lc padded to LANE
    v: jnp.ndarray        # (L, B, H, Lc, Dh) int8
    v_scale: jnp.ndarray  # (L, B, H, Sc) f32


def _pad_lanes(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def init_stacked_cache(num_layers: int, batch: int, heads: int,
                       cache_len: int, head_dim: int) -> StackedKV:
    sc = _pad_lanes(cache_len)
    return StackedKV(
        k=jnp.zeros((num_layers, batch, heads, cache_len, head_dim),
                    jnp.int8),
        k_scale=jnp.zeros((num_layers, batch, heads, sc), jnp.float32),
        v=jnp.zeros((num_layers, batch, heads, cache_len, head_dim),
                    jnp.int8),
        v_scale=jnp.zeros((num_layers, batch, heads, sc), jnp.float32))


def quantize_stacked(x_layers, cache_len: int) -> StackedKV:
    """Quantize per-layer (B, H, L, Dh) K/V pairs into a StackedKV whose L
    axis is padded to ``cache_len`` (symmetric per-position int8, matching
    ops/kv_quant.quantize)."""
    ks = jnp.stack([k for k, _ in x_layers])   # (L, B, H, Lm, Dh)
    vs = jnp.stack([v for _, v in x_layers])

    def quant(t):
        amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1)
        scale = amax / 127.0
        q = jnp.round(t.astype(jnp.float32) / jnp.maximum(scale, 1e-12)[..., None])
        lm = t.shape[3]
        qp = jnp.pad(q.astype(jnp.int8),
                     ((0, 0), (0, 0), (0, 0), (0, cache_len - lm), (0, 0)))
        sp = jnp.pad(scale, ((0, 0), (0, 0), (0, 0),
                             (0, _pad_lanes(cache_len) - lm)))
        return qp, sp

    kq, ksc = quant(ks)
    vq, vsc = quant(vs)
    return StackedKV(k=kq, k_scale=ksc, v=vq, v_scale=vsc)


def update_stacked_cache(cache: StackedKV, k_new: jnp.ndarray,
                         v_new: jnp.ndarray, k_sc: jnp.ndarray,
                         v_sc: jnp.ndarray, pos) -> StackedKV:
    """Append the megakernel's per-layer new K/V (already int8-quantized
    in-kernel) at position ``pos``.  k_new/v_new: (L, B, H*Dh) int8;
    k_sc/v_sc: (L, B, H) f32."""
    nl, b, hd = k_new.shape
    h = cache.k.shape[2]
    dh = hd // h
    kn = k_new.reshape(nl, b, h, 1, dh)
    vn = v_new.reshape(nl, b, h, 1, dh)
    k = jax.lax.dynamic_update_slice(cache.k, kn, (0, 0, 0, pos, 0))
    v = jax.lax.dynamic_update_slice(cache.v, vn, (0, 0, 0, pos, 0))
    ks = jax.lax.dynamic_update_slice(cache.k_scale, k_sc[..., None],
                                      (0, 0, 0, pos))
    vs = jax.lax.dynamic_update_slice(cache.v_scale, v_sc[..., None],
                                      (0, 0, 0, pos))
    return StackedKV(k=k, k_scale=ks, v=v, v_scale=vs)


# --------------------------------------------------------------------- #
# kernel body
# --------------------------------------------------------------------- #

def _rowquant(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization over the last dim (f32 in)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(x / jnp.maximum(scale, 1e-12))
    return q.astype(jnp.int8), scale


def _layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _attend_chunks(x_rows, kv_refs, chunk, n_chunks, live_chunks, pos_limit,
                   heads, head_dim, bufs, sems, extra_kv=None):
    """Double-buffered chunked attention over an int8 cache.

    x_rows: (B, D) f32 query activations (pre-projection done by caller:
    x_rows IS q already, laid out (B, H*Dh)).
    kv_refs: (k_hbm, ks_hbm, v_hbm, vs_hbm) ANY-space refs for this layer
             (pre-sliced: .at[layer] applied by caller).
    live_chunks: how many batch chunks exist (static == n_chunks).
    pos_limit: keys with index >= pos_limit are masked.
    extra_kv: optional (k_cur, k_cur_scale, v_cur, v_cur_scale) for the
              current token ((B, H*Dh) int8 rows + (B*H, 1) scales).
    Returns (B, D) f32 attention output (pre out-projection).
    """
    kbuf, ksbuf, vbuf, vsbuf = bufs
    k_hbm, ks_hbm, v_hbm, vs_hbm = kv_refs
    b = x_rows.shape[0]
    cache_len = k_hbm.shape[2]

    def start_dma(c, slot):
        lo = c * chunk
        return [
            pltpu.make_async_copy(k_hbm.at[pl.ds(lo, chunk)], kbuf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(ks_hbm.at[pl.ds(lo, chunk)], ksbuf.at[slot],
                                  sems.at[slot, 1]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(lo, chunk)], vbuf.at[slot],
                                  sems.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[pl.ds(lo, chunk)], vsbuf.at[slot],
                                  sems.at[slot, 3]),
        ]

    for d in start_dma(0, 0):
        d.start()

    scale = head_dim ** -0.5
    n = chunk * heads
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, cache_len), 2)
    valid = l_ids < pos_limit
    out = jnp.zeros((b, heads * head_dim), jnp.float32)

    for c in range(n_chunks):
        slot = c % 2

        if c + 1 < n_chunks:
            for d in start_dma(c + 1, (c + 1) % 2):
                d.start()
        for d in start_dma(c, slot):
            d.wait()

        qc = x_rows[c * chunk:(c + 1) * chunk].reshape(n, 1,
                                                       head_dim * heads // heads)
        q8, q_scale = _rowquant(qc)

        kc = kbuf[slot].reshape(n, cache_len, head_dim)
        s32 = jax.lax.dot_general(
            q8, kc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)              # (n, 1, Lc)
        ksc = ksbuf[slot].reshape(n, 1, -1)[:, :, :cache_len]
        s = s32.astype(jnp.float32) * (q_scale * scale) * ksc
        s = jnp.where(valid, s, NEG_INF)

        if extra_kv is not None:
            k_cur, k_cur_sc, v_cur, v_cur_sc = extra_kv
            kc_cur = k_cur[c * chunk:(c + 1) * chunk].reshape(n, -1)
            s_cur = jnp.sum(
                q8[:, 0].astype(jnp.float32) * kc_cur.astype(jnp.float32),
                axis=-1, keepdims=True)
            s_cur = (s_cur * q_scale[:, 0] * scale *
                     k_cur_sc[c * chunk * heads:(c + 1) * chunk * heads])
            m = jnp.maximum(jnp.max(s[:, 0], -1, keepdims=True), s_cur)
            e = jnp.exp(s[:, 0] - m)
            e_cur = jnp.exp(s_cur - m)
            denom = jnp.sum(e, -1, keepdims=True) + e_cur
            w = e / denom
            w_cur = e_cur / denom
        else:
            m = jnp.max(s[:, 0], -1, keepdims=True)
            e = jnp.exp(s[:, 0] - m)
            w = e / jnp.sum(e, -1, keepdims=True)
            w_cur = None

        vsc = vsbuf[slot].reshape(n, -1)[:, :cache_len]
        wv = w * vsc
        wv = jnp.where(valid[:, 0], wv, 0.0)
        w8, w_scale = _rowquant(wv)
        vc = vbuf[slot].reshape(n, cache_len, head_dim)
        o32 = jax.lax.dot_general(
            w8[:, None, :], vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)              # (n, 1, Dh)
        oc = o32.astype(jnp.float32)[:, 0] * w_scale
        if w_cur is not None:
            vc_cur = v_cur[c * chunk:(c + 1) * chunk].reshape(n, -1)
            v_cur_s = v_cur_sc[c * chunk * heads:(c + 1) * chunk * heads]
            oc = oc + (w_cur * v_cur_s) * vc_cur.astype(jnp.float32)
        out = jax.lax.dynamic_update_slice(
            out, oc.reshape(chunk, heads * head_dim), (c * chunk, 0))

    return out
