"""KV-cached batched beam search (BASELINE config 2: beam=3).

The reference has no beam search; this is a new capability using the same
cached decode step as greedy generation.  Standard length-normalized beam
search over the flat caption+label+bbox vocabulary:

  - beams live in the batch dimension (B*K rows share one cached decode),
  - finished beams (EOS emitted) are frozen: they re-emit PAD with zero
    added log-prob,
  - selection is top-K over the K*V successor scores per image,
  - KV caches are gathered to follow their beam's parent (one take per
    step, fused by XLA).

Returns the top beam per image plus all K candidates.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mdcnet_tpu.config import BOS_ID, EOS_ID, PAD_ID

NEG_INF = -1e9


class BeamResult(NamedTuple):
    tokens: jnp.ndarray       # (B, K, steps+1) best-first
    log_probs: jnp.ndarray    # (B, K)
    confs: jnp.ndarray        # (B, K, ceil(steps/conf_every)) per-beam
    # top-1 confidence of the chosen token, recorded every conf_every
    # steps — the beam analogue of generate()'s confidence surface, so
    # postprocess() can consume beam output unchanged (inference_p.py:84-86)


@functools.partial(jax.jit, static_argnames=("model", "steps", "beam_size",
                                             "length_penalty", "conf_every"))
def beam_search(model, params, images: jnp.ndarray, steps: int = 101,
                beam_size: int = 3, length_penalty: float = 0.0,
                conf_every: int = 4) -> BeamResult:
    decoder = model.decoder
    B = images.shape[0]
    K = beam_size
    cache_len = decoder.max_len - 1
    steps = min(steps, cache_len - 1)

    encoder_out = model.apply(params, images, method="encode")
    # expand each image to K beams: (B*K, ...)
    encoder_out = jnp.repeat(encoder_out, K, axis=0)
    mem_kvs = model.apply(params, encoder_out,
                          method=lambda m, e: m.decoder.prepare_memory(e))
    caches = decoder.init_cache(B * K, cache_len)

    tokens0 = jnp.full((B, K, steps + 1), PAD_ID, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(BOS_ID)
    # only beam 0 is live at the start so identical beams don't duplicate
    scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B, 1))
    positions = jnp.arange(cache_len)[None, :]

    def gather_beams(tree, parent):  # parent: (B, K) indices into K
        flat_idx = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
        return jax.tree_util.tree_map(lambda x: x[flat_idx], tree)

    def body(carry, i):
        tokens, scores, caches, finished, confs = carry
        cur = jax.lax.dynamic_slice(tokens, (0, 0, i), (B, K, 1))[..., 0]
        key_valid = (positions <= i) & jnp.ones((B * K, 1), bool)
        logits, caches = model.apply(
            params, cur.reshape(-1), i, caches, mem_kvs, key_valid,
            method=lambda m, *a: m.decoder.decode_step(*a))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, -1)
        V = logp.shape[-1]

        # finished beams: only PAD continuation, with zero added score
        pad_only = jnp.full((B, K, V), NEG_INF).at[:, :, PAD_ID].set(0.0)
        logp = jnp.where(finished[..., None], pad_only, logp)

        cand = scores[..., None] + logp                    # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)       # (B, K)
        parent = top_idx // V
        tok = (top_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, parent[..., None], axis=1)
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok[..., None], (0, 0, i + 1))
        # chosen-token probability = exp(new beam score - parent score)
        prev = jnp.take_along_axis(scores, parent, axis=1)
        conf = jnp.exp(top_scores - prev)
        confs = jnp.take_along_axis(confs, parent[..., None], axis=1)
        confs = jax.lax.dynamic_update_slice(
            confs, conf[..., None], (0, 0, i))
        finished = jnp.take_along_axis(finished, parent, axis=1) | \
            (tok == EOS_ID)
        caches = gather_beams(caches, parent)
        return (tokens, top_scores, caches, finished, confs), None

    confs0 = jnp.zeros((B, K, steps), jnp.float32)
    init = (tokens0, scores0, caches, jnp.zeros((B, K), bool), confs0)
    (tokens, scores, _, finished, confs), _ = jax.lax.scan(
        body, init, jnp.arange(steps))

    if length_penalty > 0.0:
        lengths = jnp.sum(tokens != PAD_ID, axis=-1).astype(jnp.float32)
        norm = scores / (lengths ** length_penalty)
    else:
        norm = scores
    order = jnp.argsort(-norm, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    scores = jnp.take_along_axis(norm, order, axis=1)
    confs = jnp.take_along_axis(confs, order[..., None], axis=1)
    n_confs = (steps + conf_every - 1) // conf_every
    confs = confs[:, :, ::conf_every][:, :, :n_confs]
    return BeamResult(tokens=tokens, log_probs=scores, confs=confs)
