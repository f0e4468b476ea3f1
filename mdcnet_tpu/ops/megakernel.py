"""Whole-step decode megakernel: all decoder layers in ONE pallas_call.

Why: autoregressive decode on the flagship geometry reads ~2.75 GB/step at
B=256 in bf16 (cross-attention K/V + self cache + weights, docs/PERF.md) and
XLA's fused step already runs at 84% of that HBM floor.  Round-1 showed that
per-attention Pallas calls (16/step) lose more to fixed costs than int8
storage saves.  This kernel runs the ENTIRE decoder stack for one token in
one pallas_call:

  - grid = (num_layers,): per-layer weights arrive via pipelined BlockSpecs
    (the next layer's weights prefetch during the current layer's compute);
  - the batch's activations live in a VMEM scratch (B x D f32 = 1 MB)
    across grid steps — they never touch HBM between layers;
  - K/V caches are stored int8 (+ f32 per-position scales) in HBM and
    streamed in batch-chunks with double-buffered manual DMA — HBM sees
    half the bytes of the bf16 path;
  - dots run on the MXU in bf16 (int8 values convert exactly; scales fold
    into scores / softmax weights) — measured: batched-GEMV throughput is
    set by rhs elements streamed (~0.4G elem/us) regardless of M, and int8
    MXU dots crash this toolchain's Mosaic, so bf16-from-int8 is the fastest
    *compiling* lowering (benchmarks/probe_attn_*.py);
  - self-attention uses a position-bucketed dot extent: while pos < bucket
    boundaries only the live prefix of the cache is DMA'd and dotted, so
    early decode steps (the common case on GC10's ~12-21 token sequences)
    skip most of the self-cache work;
  - the current token's K/V never round-trips through HBM: it is quantized
    in-kernel, attended in-register, and emitted as an output for the caller
    to append to the cache (one dynamic_update_slice in XLA).

This kernel is an EXPERIMENTAL fixed-budget path behind
``infer.generate.generate_megakernel`` (measured 1.09x over XLA at the full
budget, 0.95x on the early-exit serving workload — docs/PERF.md); the bf16
XLA path (+ speculative decoding) is the serving default and is the only
path reachable from ``generate()``.

Reference workload: inference_p.py:69-115 (greedy/top-k batch generation
over a 101-step budget).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


# --------------------------------------------------------------------- #
# stacked layouts
# --------------------------------------------------------------------- #

class StackedDecoder(NamedTuple):
    """Per-layer decoder weights stacked on a leading layer axis.

    Matmul weights are stored **int8 with per-output-channel scales** (v3):
    the pipeline double-buffers each layer's weight block in VMEM, so bf16
    blocks (20.8 MB/layer at the flagship geometry) cost 41.6 MB of VMEM and
    overflow the 128 MiB budget; int8 halves both the VMEM footprint and the
    ~166 MB/step HBM weight stream.  Values convert int8->bf16 exactly in
    VMEM before the MXU dot (int8 dots crash this toolchain's Mosaic); the
    per-column scale folds in after the f32-accumulated dot.
    """
    wqkv: jnp.ndarray    # (L, D, 3D) int8: self q|k|v packed
    bqkv: jnp.ndarray    # (L, 1, 3D) f32
    wo_s: jnp.ndarray    # (L, D, D) int8
    bo_s: jnp.ndarray    # (L, 1, D) f32
    wq_c: jnp.ndarray    # (L, D, D) int8
    bq_c: jnp.ndarray    # (L, 1, D) f32
    wo_c: jnp.ndarray    # (L, D, D) int8
    bo_c: jnp.ndarray    # (L, 1, D) f32
    w1: jnp.ndarray      # (L, D, F) int8
    b1: jnp.ndarray      # (L, 1, F) f32
    w2: jnp.ndarray      # (L, F, D) int8
    b2: jnp.ndarray      # (L, 1, D) f32
    ln: jnp.ndarray      # (L, 8, D) f32: ln1 s,b | ln2 s,b | ln3 s,b | pad
    wsc: jnp.ndarray     # (L, 8, W) f32 per-col weight scales, W =
    #                      max(3D, F); rows: qkv|o_s|q_c|o_c|w1|w2|pad|pad


def _colquant(w: jnp.ndarray, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-column int8 quant.  w: (L, K, N) f32 ->
    (int8 (L, K, N), scales (L, N) f32 zero-padded to ``width``)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1)                     # (L, N)
    scale = amax / 127.0
    q = jnp.round(w / jnp.maximum(scale, 1e-12)[:, None, :])
    pad = width - w.shape[2]
    return q.astype(jnp.int8), jnp.pad(scale, ((0, 0), (0, pad)))


def stack_decoder_weights(dec_params: Dict[str, Any], num_layers: int
                          ) -> StackedDecoder:
    """Stack flax per-layer decoder params (models/decoder.py naming) into
    the megakernel layout.  Runs once per generation (jit-cached)."""
    def get(i, *path):
        node = dec_params[f"layer{i}"]
        for p in path:
            node = node[p]
        return jnp.asarray(node)

    def stacked(*path):
        return jnp.stack([get(i, *path) for i in range(num_layers)]
                         ).astype(jnp.float32)

    def stacked_bias(*path):
        return jnp.stack([get(i, *path) for i in range(num_layers)]
                         ).astype(jnp.float32)[:, None, :]

    wq = stacked("self_attn", "q_proj", "kernel")
    wk = stacked("self_attn", "k_proj", "kernel")
    wv = stacked("self_attn", "v_proj", "kernel")
    bq = stacked_bias("self_attn", "q_proj", "bias")
    bk = stacked_bias("self_attn", "k_proj", "bias")
    bv = stacked_bias("self_attn", "v_proj", "bias")
    ln_rows = []
    for i in range(num_layers):
        rows = [get(i, "norm1", "scale"), get(i, "norm1", "bias"),
                get(i, "norm2", "scale"), get(i, "norm2", "bias"),
                get(i, "norm3", "scale"), get(i, "norm3", "bias")]
        d = rows[0].shape[0]
        rows += [jnp.zeros((d,), jnp.float32)] * 2
        ln_rows.append(jnp.stack([r.astype(jnp.float32) for r in rows]))
    dim = wq.shape[1]
    ffn_dim = get(0, "linear1", "kernel").shape[1]
    width = max(3 * dim, ffn_dim)
    qkv8, qkv_sc = _colquant(jnp.concatenate([wq, wk, wv], axis=-1), width)
    wos8, wos_sc = _colquant(stacked("self_attn", "out_proj", "kernel"),
                             width)
    wqc8, wqc_sc = _colquant(stacked("cross_attn", "q_proj", "kernel"),
                             width)
    woc8, woc_sc = _colquant(stacked("cross_attn", "out_proj", "kernel"),
                             width)
    w18, w1_sc = _colquant(stacked("linear1", "kernel"), width)
    w28, w2_sc = _colquant(stacked("linear2", "kernel"), width)
    zero = jnp.zeros_like(qkv_sc)
    wsc = jnp.stack([qkv_sc, wos_sc, wqc_sc, woc_sc, w1_sc, w2_sc,
                     zero, zero], axis=1)                  # (L, 8, W)
    return StackedDecoder(
        wqkv=qkv8,
        bqkv=jnp.concatenate([bq, bk, bv], axis=-1),
        wo_s=wos8,
        bo_s=stacked_bias("self_attn", "out_proj", "bias"),
        wq_c=wqc8,
        bq_c=stacked_bias("cross_attn", "q_proj", "bias"),
        wo_c=woc8,
        bo_c=stacked_bias("cross_attn", "out_proj", "bias"),
        w1=w18,
        b1=stacked_bias("linear1", "bias"),
        w2=w28,
        b2=stacked_bias("linear2", "bias"),
        ln=jnp.stack(ln_rows),
        wsc=wsc)


class StackedKV(NamedTuple):
    """Int8 cache stacked across layers.  k/v: (L, B, H, Lc, Dh) int8;
    scales: (L, B, H, Sc) f32 with Sc = Lc rounded up to the lane width."""
    k: jnp.ndarray
    k_scale: jnp.ndarray
    v: jnp.ndarray
    v_scale: jnp.ndarray


def _pad_lanes(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def init_stacked_cache(num_layers: int, batch: int, heads: int,
                       cache_len: int, head_dim: int) -> StackedKV:
    sc = _pad_lanes(cache_len)
    z8 = lambda: jnp.zeros((num_layers, batch, heads, cache_len, head_dim),
                           jnp.int8)
    zs = lambda: jnp.zeros((num_layers, batch, heads, sc), jnp.float32)
    return StackedKV(k=z8(), k_scale=zs(), v=z8(), v_scale=zs())


def quantize_stacked(kv_layers, length: int) -> StackedKV:
    """Per-layer (k, v) pairs of (B, H, Lm, Dh) -> StackedKV padded to
    ``length`` positions (symmetric per-position int8, ops/kv_quant law)."""
    ks = jnp.stack([k for k, _ in kv_layers])
    vs = jnp.stack([v for _, v in kv_layers])

    def quant(t):
        amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1)
        scale = amax / 127.0
        q = jnp.round(t.astype(jnp.float32) /
                      jnp.maximum(scale, 1e-12)[..., None])
        lm = t.shape[3]
        qp = jnp.pad(q.astype(jnp.int8),
                     ((0, 0), (0, 0), (0, 0), (0, length - lm), (0, 0)))
        sp = jnp.pad(scale, ((0, 0), (0, 0), (0, 0),
                             (0, _pad_lanes(length) - lm)))
        return qp, sp

    kq, ksc = quant(ks)
    vq, vsc = quant(vs)
    return StackedKV(k=kq, k_scale=ksc, v=vq, v_scale=vsc)


def update_stacked_cache(cache: StackedKV, k_new: jnp.ndarray,
                         v_new: jnp.ndarray, k_sc: jnp.ndarray,
                         v_sc: jnp.ndarray, pos) -> StackedKV:
    """Append the kernel's per-layer new K/V (already int8) at ``pos``.
    k_new/v_new: (L, B, H*Dh) int8; k_sc/v_sc: (L, B, H) f32."""
    nl, b, hd = k_new.shape
    h = cache.k.shape[2]
    dh = hd // h
    kn = k_new.reshape(nl, b, h, 1, dh)
    vn = v_new.reshape(nl, b, h, 1, dh)
    return StackedKV(
        k=jax.lax.dynamic_update_slice(cache.k, kn, (0, 0, 0, pos, 0)),
        k_scale=jax.lax.dynamic_update_slice(
            cache.k_scale, k_sc[..., None], (0, 0, 0, pos)),
        v=jax.lax.dynamic_update_slice(cache.v, vn, (0, 0, 0, pos, 0)),
        v_scale=jax.lax.dynamic_update_slice(
            cache.v_scale, v_sc[..., None], (0, 0, 0, pos)))


# --------------------------------------------------------------------- #
# kernel
# --------------------------------------------------------------------- #

def _rowquant(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization over the last dim (f32 in)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(x / jnp.maximum(scale, 1e-12))
    return q.astype(jnp.int8), scale


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]


def _mm(a_f32, w_ref, b_ref, sc):
    """(B, K) f32 @ (K, N) int8 * sc (N,) f32 + (1, N) f32 -> (B, N) f32.
    int8 values convert exactly to bf16 in VMEM; the per-column quant scale
    folds in after the f32-accumulated MXU dot."""
    y = jnp.dot(a_f32.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return y * sc[None, :] + b_ref[0]


def _make_kernel(*, num_layers, batch, heads, head_dim, cache_len, sc_self,
                 mem_len, mem_pad, sc_mem, chunk, ffn_dim, dim, fast_ext):
    """Builds the kernel body closed over static geometry.

    ``fast_ext``: while pos < fast_ext, self-attention runs a ONE-SHOT
    per-layer path — a single DMA of the cache's first fast_ext slots and
    one whole-batch dot pair — instead of the chunk loop.  Per-dot fixed
    cost (~10 us, docs/PERF.md) makes many small dots the v1 bottleneck;
    GC10 sequences are ~10-21 tokens so almost every real decode step takes
    this path."""
    n_chunks = batch // chunk
    n = chunk * heads  # attention rows per chunk
    nb = batch * heads
    scale = head_dim ** -0.5

    def kernel(pos_ref,
               x_in, wqkv, bqkv, wo_s, bo_s, wq_c, bq_c, wo_c, bo_c,
               w1, b1, w2, b2, ln, wsc,
               sk_hbm, sks_hbm, sv_hbm, svs_hbm,
               mk_hbm, mks_hbm, mv_hbm, mvs_hbm,
               x_out, k_out, ks_out, v_out, vs_out,
               x_buf, qkv_buf, attn_buf, kbuf, ksbuf, vbuf, vsbuf, sems,
               fkbuf, fksbuf, fvbuf, fvsbuf, fsems):
        layer = pl.program_id(0)
        pos = pos_ref[0]

        @pl.when(layer == 0)
        def _():
            x_buf[:] = x_in[:]

        x = x_buf[:]

        fast = pos < fast_ext

        def fast_dma():
            return [
                pltpu.make_async_copy(
                    sk_hbm.at[layer, :, :, pl.ds(0, fast_ext)],
                    fkbuf, fsems.at[0]),
                pltpu.make_async_copy(sks_hbm.at[layer], fksbuf,
                                      fsems.at[1]),
                pltpu.make_async_copy(
                    sv_hbm.at[layer, :, :, pl.ds(0, fast_ext)],
                    fvbuf, fsems.at[2]),
                pltpu.make_async_copy(svs_hbm.at[layer], fvsbuf,
                                      fsems.at[3]),
            ]

        # overlap the fast-path cache fetch with the qkv projection, and
        # prefetch the first cross-attention chunk behind self-attention
        # (distinct buffers on the fast path)
        @pl.when(fast)
        def _():
            for d in fast_dma():
                d.start()

        # ---- fused qkv projection (full batch on the MXU) ---- #
        qkv_buf[:] = _mm(x, wqkv, bqkv, wsc[0, 0, :3 * dim]
                         ).astype(jnp.bfloat16)
        q_s = qkv_buf[:, :dim]
        k_new = qkv_buf[:, dim:2 * dim]
        v_new = qkv_buf[:, 2 * dim:]

        k8, k_sc = _rowquant(
            k_new.reshape(batch * heads, head_dim).astype(jnp.float32))
        v8, v_sc = _rowquant(
            v_new.reshape(batch * heads, head_dim).astype(jnp.float32))
        k_out[0] = k8.reshape(batch, dim)
        v_out[0] = v8.reshape(batch, dim)
        ks_out[0] = k_sc.reshape(batch, heads)
        vs_out[0] = v_sc.reshape(batch, heads)

        # ---- chunked, double-buffered attention ---- #
        def dma(hbm, buf, sem, c, slot, rows):
            lo = c * chunk
            return pltpu.make_async_copy(
                hbm.at[layer, pl.ds(lo, chunk), :, pl.ds(0, rows)],
                buf.at[slot, :, :, pl.ds(0, rows)], sem)

        def dma_scales(hbm, buf, sem, c, slot):
            lo = c * chunk
            sc = hbm.shape[3]
            return pltpu.make_async_copy(
                hbm.at[layer, pl.ds(lo, chunk)],
                buf.at[slot, :, :, pl.ds(0, sc)], sem)

        def chunk_dma_start(k_hbm, ks_hbm, v_hbm, vs_hbm, extent, c, slot):
            dma(k_hbm, kbuf, sems.at[slot, 0], c, slot, extent).start()
            dma_scales(ks_hbm, ksbuf, sems.at[slot, 1], c, slot).start()
            dma(v_hbm, vbuf, sems.at[slot, 2], c, slot, extent).start()
            dma_scales(vs_hbm, vsbuf, sems.at[slot, 3], c, slot).start()

        def attend(q_rows, k_hbm, ks_hbm, v_hbm, vs_hbm, extent, limit,
                   cur=None, skip_first_start=None):
            """q_rows: (B, D) f32.  extent: static number of key positions
            DMA'd and dotted.  limit: traced valid-key bound.  cur: optional
            (k8, k_sc, v8, v_sc) current-token K/V rows.
            ``skip_first_start``: traced bool — chunk 0's DMA was already
            issued by the caller (cross prefetch overlapping self-attention).
            Returns (B, D) f32 into attn_buf."""
            def start(c, slot):
                chunk_dma_start(k_hbm, ks_hbm, v_hbm, vs_hbm, extent, c,
                                slot)

            def wait(c, slot):
                dma(k_hbm, kbuf, sems.at[slot, 0], c, slot, extent).wait()
                dma_scales(ks_hbm, ksbuf, sems.at[slot, 1], c, slot).wait()
                dma(v_hbm, vbuf, sems.at[slot, 2], c, slot, extent).wait()
                dma_scales(vs_hbm, vsbuf, sems.at[slot, 3], c, slot).wait()

            if skip_first_start is None:
                start(0, 0)
            else:
                @pl.when(jnp.logical_not(skip_first_start))
                def _():
                    start(0, 0)
            # all row tensors stay 3D (n, 1, lanes): Mosaic supports
            # middle-1 inserts/merges only when the lane dim is 128-aligned,
            # and batched dots only with non-degenerate lhs specs — 3D
            # throughout satisfies both (see docs/PERF.md round-2 notes)
            l_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, extent), 2)
            valid = l_ids < limit

            for c in range(n_chunks):
                slot = c % 2
                if c + 1 < n_chunks:
                    start(c + 1, (c + 1) % 2)
                wait(c, slot)

                qc = q_rows[c * chunk:(c + 1) * chunk].reshape(
                    n, 1, head_dim).astype(jnp.bfloat16)
                kc = kbuf[slot, :, :, :extent].reshape(
                    n, extent, head_dim).astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    qc, kc, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # (n, 1, extent)
                ksc = ksbuf[slot].reshape(n, 1, -1)[:, :, :extent]
                s = s * (scale * ksc)
                s = jnp.where(valid, s, NEG_INF)

                if cur is not None:
                    # current token: dequantized 2D rows -> (n,1,128) -> a
                    # second dot whose output is (n,1,1), sidestepping any
                    # unaligned-lane reshape
                    kcur_d, vcur_d = cur
                    kc3 = kcur_d[c * chunk * heads:
                                 (c + 1) * chunk * heads].reshape(
                        n, 1, head_dim).astype(jnp.bfloat16)
                    s_cur = jax.lax.dot_general(
                        qc, kc3, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) * scale  # (n,1,1)
                    m = jnp.maximum(jnp.max(s, -1, keepdims=True), s_cur)
                    e = jnp.exp(s - m)
                    e_cur = jnp.exp(s_cur - m)
                    denom = jnp.sum(e, -1, keepdims=True) + e_cur
                    w = e / denom
                else:
                    m = jnp.max(s, -1, keepdims=True)
                    e = jnp.exp(s - m)
                    w = e / jnp.sum(e, -1, keepdims=True)

                vsc = vsbuf[slot].reshape(n, 1, -1)[:, :, :extent]
                wv = jnp.where(valid, w * vsc, 0.0)
                vc = vbuf[slot, :, :, :extent].reshape(
                    n, extent, head_dim).astype(jnp.bfloat16)
                o = jax.lax.dot_general(
                    wv.astype(jnp.bfloat16), vc,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # (n, 1, Dh)
                if cur is not None:
                    w_cur = e_cur / denom                    # (n, 1, 1)
                    vc3 = vcur_d[c * chunk * heads:
                                 (c + 1) * chunk * heads].reshape(
                        n, 1, head_dim)
                    o = o + w_cur * vc3
                attn_buf[c * chunk:(c + 1) * chunk, :] = o.reshape(chunk, dim)

        # cross chunk 0 prefetch: rides behind the fast self-attention path
        # (which uses its own fkbuf buffers)
        @pl.when(fast)
        def _():
            chunk_dma_start(mk_hbm, mks_hbm, mv_hbm, mvs_hbm, mem_pad, 0, 0)

        # self-attention.  Current-token K/V enter dequantized (the same
        # values future steps will read back from the cache).
        cur = (k8.astype(jnp.float32) * k_sc, v8.astype(jnp.float32) * v_sc)

        @pl.when(fast)
        def _():
            # one-shot path: whole-batch dot pair over the first fast_ext
            # cache slots (DMA'd at kernel entry)
            for d in fast_dma():
                d.wait()
            kcur_d, vcur_d = cur
            qc = q_s.reshape(nb, 1, head_dim).astype(jnp.bfloat16)
            kc = fkbuf[:].reshape(nb, fast_ext, head_dim
                                  ).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qc, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (nb, 1, fast)
            ksc = fksbuf[:].reshape(nb, 1, -1)[:, :, :fast_ext]
            s = s * (scale * ksc)
            l_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, fast_ext), 2)
            valid = l_ids < pos
            s = jnp.where(valid, s, NEG_INF)
            kc3 = kcur_d.reshape(nb, 1, head_dim).astype(jnp.bfloat16)
            s_cur = jax.lax.dot_general(
                qc, kc3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale   # (nb, 1, 1)
            m = jnp.maximum(jnp.max(s, -1, keepdims=True), s_cur)
            e = jnp.exp(s - m)
            e_cur = jnp.exp(s_cur - m)
            denom = jnp.sum(e, -1, keepdims=True) + e_cur
            vsc = fvsbuf[:].reshape(nb, 1, -1)[:, :, :fast_ext]
            wv = jnp.where(valid, (e / denom) * vsc, 0.0)
            vc = fvbuf[:].reshape(nb, fast_ext, head_dim
                                  ).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                wv.astype(jnp.bfloat16), vc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (nb, 1, Dh)
            o = o + (e_cur / denom) * vcur_d.reshape(nb, 1, head_dim)
            attn_buf[:] = o.reshape(batch, dim)

        if cache_len > fast_ext:
            @pl.when(jnp.logical_not(fast))
            def _():
                attend(q_s, sk_hbm, sks_hbm, sv_hbm, svs_hbm,
                       cache_len, pos, cur=cur)

        x = _ln(x + _mm(attn_buf[:], wo_s, bo_s, wsc[0, 1, :dim]),
                ln[0, 0], ln[0, 1])

        q_c = _mm(x, wq_c, bq_c, wsc[0, 2, :dim])
        attend(q_c, mk_hbm, mks_hbm, mv_hbm, mvs_hbm, mem_pad,
               jnp.int32(mem_len), skip_first_start=fast)
        x = _ln(x + _mm(attn_buf[:], wo_c, bo_c, wsc[0, 3, :dim]),
                ln[0, 2], ln[0, 3])

        ff = jnp.maximum(_mm(x, w1, b1, wsc[0, 4, :ffn_dim]), 0.0)
        x = _ln(x + _mm(ff, w2, b2, wsc[0, 5, :dim]), ln[0, 4], ln[0, 5])

        x_buf[:] = x
        x_out[:] = x

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "heads", "mem_len", "chunk",
                     "interpret"))
def fused_decode_step(weights: StackedDecoder, x: jnp.ndarray,
                      self_kv: StackedKV, mem_kv: StackedKV, pos,
                      *, num_layers: int, heads: int, mem_len: int,
                      chunk: int = 32, interpret: Optional[bool] = None):
    """One decode step for the whole decoder stack.

    x: (B, D) f32 embedded current token (+ positional embedding).
    self_kv: int8 cache (positions < pos are live).
    mem_kv: quantized cross-attention memory (first mem_len positions live).
    Returns (x_out (B, D) f32, k_new, v_new (L, B, D) int8,
             k_sc, v_sc (L, B, H) f32) — caller appends via
    ``update_stacked_cache`` and projects x_out to logits.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, dim = x.shape
    head_dim = dim // heads
    cache_len = self_kv.k.shape[3]
    mem_pad = mem_kv.k.shape[3]
    ffn_dim = weights.w1.shape[2]
    chunk = min(chunk, b)
    assert b % chunk == 0, (b, chunk)
    n = chunk * heads

    fast_ext = min(16, cache_len)  # sublane-aligned one-shot self extent
    # (GC10 sequences run ~21 tokens: steps 0-15 take the one-shot path,
    # the tail falls back to the chunk loop.  16 is the flagship VMEM
    # ceiling even with int8 weights: 32 was measured to exceed the 114 MiB
    # scoped-vmem limit by 8.9 MiB at B=256 — the one-shot path's live
    # K/V slab scales with fast_ext and dominates the freed weight bytes)

    kernel = _make_kernel(
        num_layers=num_layers, batch=b, heads=heads, head_dim=head_dim,
        cache_len=cache_len, sc_self=self_kv.k_scale.shape[3],
        mem_len=mem_len, mem_pad=mem_pad, sc_mem=mem_kv.k_scale.shape[3],
        chunk=chunk, ffn_dim=ffn_dim, dim=dim, fast_ext=fast_ext)

    L = num_layers
    w = weights
    def lspec(*blk):
        return pl.BlockSpec((1,) + blk,
                            lambda l, *_: (l,) + (0,) * len(blk),
                            memory_space=pltpu.VMEM)

    def const(*shp):
        return pl.BlockSpec(shp, lambda l, *_: (0,) * len(shp),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            const(b, dim),                       # x
            lspec(dim, 3 * dim), lspec(1, 3 * dim),   # wqkv, bqkv
            lspec(dim, dim), lspec(1, dim),           # wo_s, bo_s
            lspec(dim, dim), lspec(1, dim),           # wq_c, bq_c
            lspec(dim, dim), lspec(1, dim),           # wo_c, bo_c
            lspec(dim, ffn_dim), lspec(1, ffn_dim),   # w1, b1
            lspec(ffn_dim, dim), lspec(1, dim),       # w2, b2
            lspec(8, dim),                            # ln
            lspec(8, weights.wsc.shape[2]),           # wsc
            any_spec, any_spec, any_spec, any_spec,   # self k, ks, v, vs
            any_spec, any_spec, any_spec, any_spec,   # mem k, ks, v, vs
        ],
        out_specs=[
            const(b, dim),                            # x_out
            lspec(b, dim), lspec(b, heads),           # k_new, k_sc
            lspec(b, dim), lspec(b, heads),           # v_new, v_sc
        ],
        scratch_shapes=[
            pltpu.VMEM((b, dim), jnp.float32),        # x_buf
            pltpu.VMEM((b, 3 * dim), jnp.bfloat16),   # qkv_buf
            pltpu.VMEM((b, dim), jnp.float32),        # attn_buf
            # K/V chunk buffers shared by the self and cross phases
            pltpu.VMEM((2, chunk, heads, max(mem_pad, cache_len),
                        head_dim), jnp.int8),
            pltpu.VMEM((2, chunk, heads,
                        max(mem_kv.k_scale.shape[3],
                            self_kv.k_scale.shape[3])), jnp.float32),
            pltpu.VMEM((2, chunk, heads, max(mem_pad, cache_len),
                        head_dim), jnp.int8),
            pltpu.VMEM((2, chunk, heads,
                        max(mem_kv.k_scale.shape[3],
                            self_kv.k_scale.shape[3])), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            # fast-path whole-batch self buffers (first fast_ext slots)
            pltpu.VMEM((b, heads, fast_ext, head_dim), jnp.int8),
            pltpu.VMEM((b, heads, self_kv.k_scale.shape[3]), jnp.float32),
            pltpu.VMEM((b, heads, fast_ext, head_dim), jnp.int8),
            pltpu.VMEM((b, heads, self_kv.k_scale.shape[3]), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    pos_arr = jnp.full((1,), pos, jnp.int32)
    x_out, k_new, k_sc, v_new, v_sc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, dim), jnp.float32),
            jax.ShapeDtypeStruct((L, b, dim), jnp.int8),
            jax.ShapeDtypeStruct((L, b, heads), jnp.float32),
            jax.ShapeDtypeStruct((L, b, dim), jnp.int8),
            jax.ShapeDtypeStruct((L, b, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, x,
      w.wqkv, w.bqkv, w.wo_s, w.bo_s, w.wq_c, w.bq_c, w.wo_c, w.bo_c,
      w.w1, w.b1, w.w2, w.b2, w.ln, w.wsc,
      self_kv.k, self_kv.k_scale, self_kv.v, self_kv.v_scale,
      mem_kv.k, mem_kv.k_scale, mem_kv.v, mem_kv.v_scale)
    return x_out, k_new, v_new, k_sc, v_sc
