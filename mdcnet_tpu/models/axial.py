"""Axial-attention decoder variant.

Reference (axial_model.py:19-174): the decoder applies one einsum MHSA block
("AxialAttention", softmax over a configurable axis, default -1 = standard
attention over keys) to the target embedding *before* the positional
embedding, uses positional dropout 0.05, and does NOT prepend a BOS column in
forward.  ``predict`` is identical to the base variant.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mdcnet_tpu.models.decoder import CaptionDecoder
from mdcnet_tpu.models.layers import dot_product_attention

Dtype = Any


class AxialAttention(nn.Module):
    """Single MHSA block: qkv from one bias-free projection, out projection
    with bias, softmax over ``axis`` of the score matrix (axial_model.py:19-40)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        b, n, _ = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = nn.Dense(self.dim * 3, use_bias=False, **kw, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, n, self.heads, -1).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        # NB: reference scales by dim_head**-0.5 with dim_head fixed at the
        # constructor default, independent of the actual per-head width
        # (axial_model.py:23,35).
        scores = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.dim_head ** -0.5)
        attn = jnp.exp(scores - jnp.max(scores, axis=axis, keepdims=True))
        attn = attn / jnp.sum(attn, axis=axis, keepdims=True)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(q.dtype), v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        return nn.Dense(self.dim, **kw, name="to_out")(out)


class AxialCaptionDecoder(CaptionDecoder):
    """CaptionDecoder with the axial block on the target embedding, pos
    dropout 0.05, and no BOS prepend (axial_model.py:56-118)."""

    pos_dropout: float = 0.05
    prepend_bos: bool = False

    def setup(self):
        super().setup()
        self.axial_attention = AxialAttention(
            self.dim, heads=8, dtype=self.dtype, param_dtype=self.param_dtype)

    def _embed_tgt(self, tgt, pos, deterministic):
        x = self.embedding(tgt)
        x = self.axial_attention(x)
        return self.pos_drop(x + pos, deterministic=deterministic)
