"""Attention mask construction.

Reference semantics (utils.py:7-30): a float causal mask with -inf above the
diagonal, plus a target padding mask ``tgt == pad_idx``.

The reference passes the padding mask to torch as a *float* tensor
(utils.py:29), which torch adds to attention logits — i.e. padded keys
receive +1.0 instead of -inf, so the reference's pad masking is effectively
inert.  This framework masks pads properly (-inf) by default; set
``torch_float_padmask=True`` on the model to reproduce the reference's +1.0
additive behavior bit-for-bit.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9  # finite stand-in for -inf: keeps softmax NaN-free on all-masked rows


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(L, L) additive mask: 0 on/below diagonal, NEG_INF above."""
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j > i, NEG_INF, 0.0).astype(dtype)


def padding_bias(tokens: jnp.ndarray, pad_id: int, torch_float_compat: bool = False,
                 dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) additive key bias: NEG_INF at pad positions (or +1.0 in
    torch-compat mode, reproducing utils.py:29 passing a float mask)."""
    is_pad = tokens == pad_id
    fill = 1.0 if torch_float_compat else NEG_INF
    return jnp.where(is_pad, fill, 0.0).astype(dtype)


def combine_masks(causal: jnp.ndarray, pad_bias: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, L, L) additive attention bias from (L, L) causal and (B, L)
    key-side pad bias."""
    return causal[None, None, :, :] + pad_bias[:, None, None, :]
