"""Token sampling ops (jnp, jit-safe).

Vectorized equivalents of the reference's sampling helpers:
  - ``top_k_sampling`` (data_processing.py:792-796): mask logits below the
    k-th largest, sample from the renormalized softmax.
  - ``top_k_sampling_with_scores`` (data_processing.py:809-835): same, also
    returning the probability of each sampled token.
  - ``top_k_top_p_filtering``: HF-compatible top-k + nucleus filtering used
    by the batch generation loop (inference_p.py:83).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Set everything below the k-th largest logit to NEG_INF. k=0: no-op."""
    if k <= 0:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (HF semantics): remove tokens whose cumulative
    softmax probability (in descending-logit order) exceeds ``p``, always
    keeping at least the most likely token. p=1: no-op."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # remove where cumulative prob > p, shifted right so the first token
    # crossing the threshold is kept
    remove = cum > p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    # threshold = smallest kept logit
    kept = jnp.where(remove, jnp.inf, sorted_logits)
    threshold = jnp.min(kept, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def top_k_top_p_filtering(logits: jnp.ndarray, top_k: int = 0,
                          top_p: float = 1.0) -> jnp.ndarray:
    return top_p_filter(top_k_filter(logits, top_k), top_p)


def top_k_sampling(rng: jax.Array, logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sample one token per row from the top-k renormalized distribution
    (data_processing.py:792-796).  logits: (..., V) -> (...,) int32."""
    return jax.random.categorical(rng, top_k_filter(logits, k), axis=-1)


def top_k_sampling_with_scores(rng: jax.Array, logits: jnp.ndarray, k: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sampled ids, their probabilities) (data_processing.py:809-835)."""
    filtered = top_k_filter(logits, k)
    sampled = jax.random.categorical(rng, filtered, axis=-1)
    probs = jax.nn.softmax(filtered, axis=-1)
    scores = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
    return sampled, scores


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax sampling (extract_tokens, data_processing.py:798-805)."""
    return jnp.argmax(logits, axis=-1)
