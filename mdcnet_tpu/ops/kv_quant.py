"""Int8 KV-cache quantization.

Autoregressive decode on this model is HBM-bandwidth-bound: each step reads
the cross-attention K/V (constant per image, ~1.65 GB/step at B=256 on the
flagship geometry) plus the growing self-attention cache.  Symmetric
per-position int8 quantization halves that traffic; scales are one f32 per
(B, H, L) position (1/256 of the value bytes).

Used behind the ``kv_quant`` decoder flag; bf16 is the default so
caption-parity paths stay bit-stable.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class QuantKV(NamedTuple):
    """Quantized cache tensor: int8 values + per-position scale."""
    values: jnp.ndarray   # (B, H, L, D) int8
    scale: jnp.ndarray    # (B, H, L, 1) float32


def quantize(x: jnp.ndarray) -> QuantKV:
    """Symmetric per-(B,H,L) quantization over the head dim."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0
    vals = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-12))
    return QuantKV(vals.astype(jnp.int8), scale)


def dequantize(q: QuantKV, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.values.astype(jnp.float32) * q.scale).astype(dtype)


def update_slice(cache: QuantKV, new: jnp.ndarray, pos) -> QuantKV:
    """Write one quantized position into the cache at ``pos``."""
    nq = quantize(new)
    vals = jax.lax.dynamic_update_slice(cache.values, nq.values,
                                        (0, 0, pos, 0))
    scale = jax.lax.dynamic_update_slice(cache.scale, nq.scale,
                                         (0, 0, pos, 0))
    return QuantKV(vals, scale)


def quant_attention(q: jnp.ndarray, k: QuantKV, v: QuantKV,
                    bias) -> jnp.ndarray:
    """Attention that consumes int8 K/V directly.

    Scales fold into the *score* matrix (for K) and the softmax *weights*
    (for V), so the int8 tensors feed the dots through a fusable elementwise
    convert — no dequantized (B,H,L,D) copy is ever materialized in HBM.

      s[b,h,q,l] = (Σ_d q·k_i8) · k_scale[b,h,l]
      o[b,h,q,d] = Σ_l (w·v_scale)[b,h,q,l] · v_i8[b,h,l,d]
    """
    dh = q.shape[-1]
    qf = q.astype(jnp.float32) * (dh ** -0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.values.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    s = s * k.scale[..., 0][:, :, None, :]
    if bias is not None:
        s = s + bias
    w = jax.nn.softmax(s, axis=-1)
    w = w * v.scale[..., 0][:, :, None, :]
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v.values.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def init_cache(batch: int, heads: int, length: int, head_dim: int) -> QuantKV:
    return QuantKV(jnp.zeros((batch, heads, length, head_dim), jnp.int8),
                   jnp.zeros((batch, heads, length, 1), jnp.float32))
