"""Single-image incremental inference.

Behavioral spec: ``inference_single_image``
(inference_code_craeted_me_gpt.py:46-65) — the only correct-shape
incremental decoder in the reference (SURVEY §3.5):

  loop up to max_len times over the *forward* path (BOS prepended, pos-embed
  re-interpolated for the growing prefix each step), sample from the last
  position's logits with top-k, stop at EOS.

Because the forward path interpolates the positional embedding to the
current prefix length (model.py:64-68), earlier positions' embeddings change
every step, so this path cannot be KV-cached without changing outputs — it
re-runs the full prefix per step, exactly like the reference.  Use
``mdcnet_tpu.infer.generate`` (fixed pos-embed `predict` semantics) for the
fast batch path.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcnet_tpu.config import BOS_ID, EOS_ID
from mdcnet_tpu.ops.sampling import top_k_filter


def inference_single_image(model, params, image: jnp.ndarray, rng: jax.Array,
                           max_len: int = 100, top_k: int = 5,
                           include_bos: bool = True) -> List[int]:
    """image: (H, W, 3). Returns the generated token list (without the seed
    BOS, matching the reference which returns y_input[:, 1:] implicitly via
    its EOS-stop loop collecting sampled tokens)."""
    x = image[None]
    seed = [[BOS_ID]] if include_bos else [[]]
    y = np.array(seed, dtype=np.int32)
    encoder_out = model.apply(params, x, method="encode")

    out_tokens: List[int] = []
    for _ in range(max_len):
        logits = model.apply(
            params, encoder_out, jnp.asarray(y),
            method=lambda m, e, t: m.decoder(e, t, deterministic=True))
        last = logits[0, -1, :]
        rng, sub = jax.random.split(rng)
        nxt = int(jax.random.categorical(sub, top_k_filter(last, top_k)))
        if nxt == EOS_ID:
            break
        out_tokens.append(nxt)
        y = np.concatenate([y, [[nxt]]], axis=1)
    return out_tokens


def caption_single_image(model, params, image, tokenizer, rng=None,
                         top_k: int = 5) -> Tuple[List[int], list, str]:
    """Convenience wrapper: generate + tokenizer.decode to
    (labels, boxes, caption text)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokens = inference_single_image(model, params, jnp.asarray(image), rng,
                                    max_len=tokenizer.max_len, top_k=top_k)
    return tokenizer.decode([BOS_ID] + tokens + [EOS_ID])
