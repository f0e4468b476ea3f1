"""Shared transformer building blocks (flax.linen).

Design notes (TPU-first):
  - attention is computed in one fused einsum chain that XLA maps onto the
    MXU; an optional Pallas flash-attention path (mdcnet_tpu/ops/attention.py)
    takes over for long sequences.
  - KV caching for autoregressive decode is explicit: ``decode_step`` writes
    one position into a (B, H, L, Dh) cache with ``dynamic_update_slice`` so
    generation is O(L) per step instead of the reference's O(L²) full
    re-forward (model.py:92-127 re-runs the whole decoder every step).
  - names mirror torch's TransformerDecoderLayer so a .pth checkpoint
    converter can map parameters 1:1 (models/torch_convert.py).

Decoder layers are *post-norm* (residual add, then LayerNorm) with ReLU FFN,
matching torch ``nn.TransformerDecoderLayer`` defaults used by the reference
(model.py:35-36).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdcnet_tpu.ops.masks import NEG_INF

Dtype = Any


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          score_dtype=jnp.float32) -> jnp.ndarray:
    """q: (B, H, Lq, Dh), k/v: (B, H, Lk, Dh), bias: broadcastable to
    (B, H, Lq, Lk).  Softmax in float32 for stability; output in q.dtype.
    ``score_dtype=bfloat16`` halves the materialized score traffic (serving
    knob; softmax still reduces in f32 via jax.nn.softmax's internal max)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=score_dtype)
    scores = scores * (dh ** -0.5)
    if bias is not None:
        scores = scores + bias.astype(score_dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32),
                             axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def stock_flash_attention(q: jnp.ndarray, k: jnp.ndarray,
                          v: jnp.ndarray) -> jnp.ndarray:
    """Bias-free self-attention via the stock Pallas TPU flash kernel
    (jax.experimental.pallas.ops.tpu.flash_attention): scores/weights never
    round-trip through HBM.  L is padded to a multiple of 128; padded keys
    are masked out with SegmentIds, padded query rows are dropped."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, l, dh = q.shape
    lp = -(-l // 128) * 128
    if lp != l:
        pad = ((0, 0), (0, 0), (0, lp - l), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        seg = jnp.broadcast_to(
            jnp.where(jnp.arange(lp) < l, 1, 2).astype(jnp.int32), (b, lp))
        seg_ids = fa.SegmentIds(q=seg, kv=seg)
    else:
        seg_ids = None
    out = fa.flash_attention(q, k, v, segment_ids=seg_ids,
                             sm_scale=dh ** -0.5)
    return out[:, :, :l].astype(q.dtype)


class MultiHeadAttention(nn.Module):
    """Torch-compatible MHA: packed qkv semantics, bias on all projections.

    ``ring_axis``: when set, self-attention runs as ring attention over that
    mesh axis (sequence sharded across devices; valid inside shard_map only).
    """

    dim: int
    num_heads: int
    ring_axis: Optional[str] = None
    use_flash: bool = False  # Pallas blockwise attention (long sequences)
    attn_impl: str = "xla"  # "xla" | "bf16" (bf16 score matmul) | "flash"
    # (stock Pallas TPU kernel) — bias-free self-attention only; serving
    # knobs measured by benchmarks/probe_enc_attn.py
    fuse_qkv: bool = False  # pack q/k/v into ONE matmul for self-attention
    # (same reduction per output column -> numerically identical; saves two
    # HBM reads of the input and two op launches per block; params stay
    # three separate Dense so checkpoints/converters are unaffected)
    int8_mm: bool = False  # dynamic int8 projections (ops/int8.py): packed
    # QKV + out matmuls on the MXU's int8 path (~1.5x bf16 rate); serving
    # knob, approximate — agreement measured by probe_serving_knobs.py
    int8_calib: bool = False  # sow per-site activation amax into the
    # "calib_stats" collection (ops/int8.calibrate_encoder)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def head_split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, -1).transpose(0, 2, 1, 3)

    def head_merge(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, l, dh = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.q_proj = nn.Dense(self.dim, **kw)
        self.k_proj = nn.Dense(self.dim, **kw)
        self.v_proj = nn.Dense(self.dim, **kw)
        self.out_proj = nn.Dense(self.dim, **kw)

    def _fused_qkv(self, x: jnp.ndarray, amax=None):
        """q/k/v via one packed (D, 3D) matmul; init-time falls back to the
        three Dense calls so the param tree is created normally.  ``amax``:
        calibrated activation amax -> static int8 (ops/int8.py)."""
        pk = lambda m: m.variables["params"]
        w = jnp.concatenate(
            [pk(m)["kernel"] for m in (self.q_proj, self.k_proj,
                                       self.v_proj)], axis=1
        ).astype(self.dtype)
        b = jnp.concatenate(
            [pk(m)["bias"] for m in (self.q_proj, self.k_proj, self.v_proj)]
        ).astype(self.dtype)
        if amax is not None:
            from mdcnet_tpu.ops.int8 import int8_matmul_static
            qkv = int8_matmul_static(x.astype(self.dtype), w, b, amax)
        elif self.int8_mm:
            from mdcnet_tpu.ops.int8 import int8_matmul
            qkv = int8_matmul(x.astype(self.dtype), w, b)
        else:
            qkv = x.astype(self.dtype) @ w + b
        return jnp.split(qkv, 3, axis=-1)

    def _out(self, x: jnp.ndarray, amax=None) -> jnp.ndarray:
        """Output projection; int8 when a serving knob is on."""
        if self.int8_calib:
            self.sow("calib_stats", "out_in",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=jnp.maximum)
        if amax is not None and not self.is_initializing():
            from mdcnet_tpu.ops.int8 import int8_matmul_static
            p = self.out_proj.variables["params"]
            return int8_matmul_static(x, p["kernel"].astype(self.dtype),
                                      p["bias"].astype(self.dtype), amax)
        if self.int8_mm and not self.is_initializing():
            from mdcnet_tpu.ops.int8 import int8_matmul
            p = self.out_proj.variables["params"]
            return int8_matmul(x, p["kernel"].astype(self.dtype),
                               p["bias"].astype(self.dtype))
        return self.out_proj(x)

    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                 int8_amax=None) -> jnp.ndarray:
        qkv_amax = out_amax = None
        if int8_amax is not None:
            qkv_amax, out_amax = int8_amax
        if self.int8_calib:
            self.sow("calib_stats", "qkv_in",
                     jnp.max(jnp.abs(query.astype(jnp.float32))),
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=jnp.maximum)
        if (self.fuse_qkv and query is key and key is value
                and not self.is_initializing()):
            q, k, v = map(self.head_split,
                          self._fused_qkv(query, amax=qkv_amax))
        else:
            q = self.head_split(self.q_proj(query))
            k = self.head_split(self.k_proj(key))
            v = self.head_split(self.v_proj(value))
        if self.ring_axis is not None:
            from mdcnet_tpu.parallel.context import ring_attention
            assert bias is None, "ring attention path is bias-free (encoder)"
            out = ring_attention(q, k, v, axis_name=self.ring_axis)
        elif self.use_flash and bias is None:
            from mdcnet_tpu.ops.attention import flash_attention
            out = flash_attention(q, k, v)
        elif self.attn_impl == "flash" and bias is None:
            out = stock_flash_attention(q, k, v)
        elif self.attn_impl == "bf16" and bias is None:
            out = dot_product_attention(q, k, v, score_dtype=jnp.bfloat16)
        else:
            out = dot_product_attention(q, k, v, bias)
        return self._out(self.head_merge(out), amax=out_amax)

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Apply only the k/v projections (for KV-cache prefill)."""
        return self.head_split(self.k_proj(x)), self.head_split(self.v_proj(x))


class TorchDecoderLayer(nn.Module):
    """Post-norm transformer decoder layer matching torch defaults:
    self-attn -> add&norm -> cross-attn -> add&norm -> ReLU FFN -> add&norm,
    dropout 0.1 on each sublayer output (nn.TransformerDecoderLayer)."""

    dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.self_attn = MultiHeadAttention(self.dim, self.num_heads, **kw)
        self.cross_attn = MultiHeadAttention(self.dim, self.num_heads, **kw)
        self.linear1 = nn.Dense(self.ffn_dim, **kw)
        self.linear2 = nn.Dense(self.dim, **kw)
        ln = lambda: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.norm1, self.norm2, self.norm3 = ln(), ln(), ln()
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 self_bias: Optional[jnp.ndarray],
                 cross_bias: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = self.self_attn(tgt, tgt, tgt, self_bias)
        tgt = self.norm1(tgt + self.drop(x, deterministic=deterministic))
        x = self.cross_attn(tgt, memory, memory, cross_bias)
        tgt = self.norm2(tgt + self.drop(x, deterministic=deterministic))
        x = self.linear2(self.drop(nn.relu(self.linear1(tgt)),
                                   deterministic=deterministic))
        tgt = self.norm3(tgt + self.drop(x, deterministic=deterministic))
        return tgt

    def decode_step(self, tgt: jnp.ndarray, kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
                    mem_kv: Tuple[jnp.ndarray, jnp.ndarray],
                    pos: jnp.ndarray, key_valid: jnp.ndarray,
                    mem_pos: Optional[int] = None
                    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """One-token decode. tgt: (B, 1, D); kv_cache: ((B,H,L,Dh) k, v);
        mem_kv: precomputed cross-attention k/v; pos: scalar position OR a
        (B,) vector of per-row positions (continuous-batching serving, where
        every slot decodes at its own depth); key_valid: (B, L) bool — True
        for positions < pos+1 that hold non-pad tokens.
        Returns (out (B,1,D), updated kv_cache)."""
        from mdcnet_tpu.ops import kv_quant

        k_cache, v_cache = kv_cache
        quantized = isinstance(k_cache, kv_quant.QuantKV)
        per_row = getattr(pos, "ndim", 0) == 1
        assert not (per_row and quantized), \
            "per-row positions require the unquantized cache"
        q = self.self_attn.head_split(self.self_attn.q_proj(tgt))
        k_new = self.self_attn.head_split(self.self_attn.k_proj(tgt))
        v_new = self.self_attn.head_split(self.self_attn.v_proj(tgt))
        bias = jnp.where(key_valid[:, None, None, :], 0.0, NEG_INF
                         ).astype(jnp.float32)
        if per_row:
            # scatter each row's new K/V at that row's own position
            rows = jnp.arange(k_cache.shape[0])
            k_cache = k_cache.at[rows, :, pos].set(k_new[:, :, 0])
            v_cache = v_cache.at[rows, :, pos].set(v_new[:, :, 0])
            x = dot_product_attention(q, k_cache, v_cache, bias)
        elif quantized:
            from mdcnet_tpu.ops.decode_kernel import fused_int8_decode_attention
            k_cache = kv_quant.update_slice(k_cache, k_new, pos)
            v_cache = kv_quant.update_slice(v_cache, v_new, pos)
            # Pallas kernel: int8 K/V dequantized in VMEM, positions <= pos
            # (key_valid in the cached decode loop is exactly that window)
            x = fused_int8_decode_attention(q[:, :, 0], k_cache, v_cache,
                                            pos)[:, :, None]
        else:
            k_cache = jax.lax.dynamic_update_slice(k_cache, k_new,
                                                   (0, 0, pos, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v_new,
                                                   (0, 0, pos, 0))
            x = dot_product_attention(q, k_cache, v_cache, bias)
        x = self.self_attn.out_proj(self.self_attn.head_merge(x))
        tgt = self.norm1(tgt + x)

        mk, mv = mem_kv
        q = self.cross_attn.head_split(self.cross_attn.q_proj(tgt))
        if isinstance(mk, kv_quant.QuantKV):
            from mdcnet_tpu.ops.decode_kernel import fused_int8_decode_attention
            # mem_pos = real memory length - 1 (the quantized memory may be
            # padded to the DMA sublane granularity; padded keys are masked)
            mem_len = mem_pos if mem_pos is not None else mk.values.shape[2] - 1
            x = fused_int8_decode_attention(
                q[:, :, 0], mk, mv, jnp.asarray(mem_len, jnp.int32),
                block_l=128)[:, :, None]
        else:
            x = dot_product_attention(q, mk, mv)
        x = self.cross_attn.out_proj(self.cross_attn.head_merge(x))
        tgt = self.norm2(tgt + x)

        x = self.linear2(nn.relu(self.linear1(tgt)))
        tgt = self.norm3(tgt + x)
        return tgt, (k_cache, v_cache)

    def decode_block_split(self, tgt: jnp.ndarray,
                           kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
                           mem_kv: Tuple[jnp.ndarray, jnp.ndarray],
                           cache_bias: jnp.ndarray, blk_bias: jnp.ndarray
                           ) -> Tuple[jnp.ndarray,
                                      Tuple[jnp.ndarray, jnp.ndarray]]:
        """K-token decode with a READ-ONLY cache (scatter-free verify).

        Instead of scattering the K new K/V rows into the cache at per-row
        ragged positions and attending over the result (``decode_block`` —
        a serialized TPU scatter per layer per {K,V}), self-attention is
        split into two score matmuls sharing one softmax:

          scores = [q @ k_cache^T  |  q @ k_new^T]       (B,H,K,L) | (B,H,K,K)
          out    = w[..., :L] @ v_cache + w[..., L:] @ v_new

        which touches no cache bytes beyond the reads attention needs
        anyway (no concat copy, no scatter).  The caller commits accepted
        rows once per verify step via ``CaptionDecoder.commit_blocks``.

        tgt: (B, K, D); cache_bias: (B, 1, 1, L) additive bias for committed
        cache slots (l < pos[b]); blk_bias: (1, 1, K, K) causal bias inside
        the block.  Returns (out (B, K, D), (k_new, v_new) each (B,H,K,Dh)).
        """
        from mdcnet_tpu.ops import kv_quant

        k_cache, v_cache = kv_cache
        assert not isinstance(k_cache, kv_quant.QuantKV), \
            "speculative decode requires the unquantized cache"
        q = self.self_attn.head_split(self.self_attn.q_proj(tgt))
        k_new = self.self_attn.head_split(self.self_attn.k_proj(tgt))
        v_new = self.self_attn.head_split(self.self_attn.v_proj(tgt))
        dh = q.shape[-1]
        s_cache = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache,
                             preferred_element_type=jnp.float32)
        s_blk = jnp.einsum("bhqd,bhkd->bhqk", q, k_new,
                           preferred_element_type=jnp.float32)
        scores = jnp.concatenate(
            [s_cache * (dh ** -0.5) + cache_bias,
             s_blk * (dh ** -0.5) + blk_bias], axis=-1)
        w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        lc = k_cache.shape[2]
        x = (jnp.einsum("bhqk,bhkd->bhqd", w[..., :lc], v_cache,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("bhqk,bhkd->bhqd", w[..., lc:], v_new,
                          preferred_element_type=jnp.float32)).astype(q.dtype)
        x = self.self_attn.out_proj(self.self_attn.head_merge(x))
        tgt = self.norm1(tgt + x)

        mk, mv = mem_kv
        assert not isinstance(mk, kv_quant.QuantKV), \
            "speculative decode requires unquantized memory K/V"
        q = self.cross_attn.head_split(self.cross_attn.q_proj(tgt))
        x = dot_product_attention(q, mk, mv)
        x = self.cross_attn.out_proj(self.cross_attn.head_merge(x))
        tgt = self.norm2(tgt + x)

        x = self.linear2(nn.relu(self.linear1(tgt)))
        tgt = self.norm3(tgt + x)
        return tgt, (k_new, v_new)

    def decode_block(self, tgt: jnp.ndarray,
                     kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
                     mem_kv: Tuple[jnp.ndarray, jnp.ndarray],
                     pos: jnp.ndarray, key_valid: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """K-token decode for speculative verification.  tgt: (B, K, D) —
        the last committed token followed by K-1 draft tokens; pos: (B,)
        per-row cache write offsets; key_valid: (B, K, L) bool — query j of
        row b may attend cache slot l iff l <= pos[b] + j (committed prefix
        plus the draft slots written this call, which is exactly
        teacher-forcing on the draft).  Returns (out (B, K, D), caches).

        Requires the unquantized cache (the megakernel / int8 paths have
        their own loop)."""
        from mdcnet_tpu.ops import kv_quant

        k_cache, v_cache = kv_cache
        assert not isinstance(k_cache, kv_quant.QuantKV), \
            "speculative decode requires the unquantized cache"
        b, k_blk = tgt.shape[0], tgt.shape[1]
        q = self.self_attn.head_split(self.self_attn.q_proj(tgt))
        k_new = self.self_attn.head_split(self.self_attn.k_proj(tgt))
        v_new = self.self_attn.head_split(self.self_attn.v_proj(tgt))
        rows = jnp.arange(b)[:, None]
        cols = pos[:, None] + jnp.arange(k_blk)[None, :]        # (B, K)
        # advanced-index scatter: (B,1) rows x (B,K) cols around the ':' head
        # axis yields (B, K, H, Dh) — matching k_new transposed
        k_cache = k_cache.at[rows, :, cols].set(
            k_new.transpose(0, 2, 1, 3).astype(k_cache.dtype))
        v_cache = v_cache.at[rows, :, cols].set(
            v_new.transpose(0, 2, 1, 3).astype(v_cache.dtype))
        bias = jnp.where(key_valid[:, None], 0.0, NEG_INF).astype(jnp.float32)
        x = dot_product_attention(q, k_cache, v_cache, bias)
        x = self.self_attn.out_proj(self.self_attn.head_merge(x))
        tgt = self.norm1(tgt + x)

        mk, mv = mem_kv
        assert not isinstance(mk, kv_quant.QuantKV), \
            "speculative decode requires unquantized memory K/V"
        q = self.cross_attn.head_split(self.cross_attn.q_proj(tgt))
        x = dot_product_attention(q, mk, mv)
        x = self.cross_attn.out_proj(self.cross_attn.head_merge(x))
        tgt = self.norm2(tgt + x)

        x = self.linear2(nn.relu(self.linear1(tgt)))
        tgt = self.norm3(tgt + x)
        return tgt, (k_cache, v_cache)
