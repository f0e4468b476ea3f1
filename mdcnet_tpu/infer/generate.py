"""Autoregressive generation: KV-cached, fully jitted.

The reference's batch loop (inference_p.py:69-90) re-runs the encoder and the
*entire* padded decoder forward every step — O(steps · L²) attention work with
no caching (model.py:92-127, SURVEY §3.3).  Here:

  - the encoder runs ONCE per batch;
  - cross-attention K/V are precomputed once (``prepare_memory``);
  - each step advances one token against per-layer KV caches inside a single
    ``lax.scan`` — one compiled kernel for the whole generation;
  - sampling reproduces the reference's semantics: greedy argmax by default,
    multinomial under top-k/top-p filtering otherwise (inference_p.py:74-77),
    with top-1 confidence recorded every ``conf_every`` steps
    (inference_p.py:84-86).

Token-for-token parity of the cached path against the reference's padded
full-forward ``predict`` is asserted in tests/test_generate.py.

``postprocess`` applies the reference's EOS structure gate
((EOS_idx - 1) % 5 == 0, inference_p.py:93-115) and tokenizer decode.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcnet_tpu.config import BOS_ID, EOS_ID, PAD_ID
from mdcnet_tpu.ops.sampling import top_k_top_p_filtering


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray   # (B, steps+1) including the seeding BOS
    confs: jnp.ndarray    # (B, ceil(steps/conf_every)) top-1 confidence
    # decode-loop iterations executed (scalar int32; for the greedy path
    # this equals the number of token steps, for speculative decode it is
    # the number of verify blocks — the raggedness diagnostic: wall time
    # scales with this, committed tokens with acc per block)
    n_iters: jnp.ndarray | None = None


def prepare_memory_folded_from_images(model, params, images: jnp.ndarray):
    """Cross-attention K/V straight from pixels with the channel bottleneck
    folded into the K/V projection (decoder.prepare_memory_folded): halves
    the prefill contraction and never materializes the (B, N, D)
    bottleneck output.  Returns (mem_kvs, batch)."""
    enc_raw = model.apply(params, images,
                          method=lambda m, im: m.encoder.encode_raw(im))
    return model.apply(
        params, enc_raw,
        method=lambda m, e: m.decoder.prepare_memory_folded(
            e, m.encoder.pool_matrix())), enc_raw.shape[0]


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "top_k", "top_p", "greedy",
                     "conf_every", "temperature", "early_exit",
                     "compact_to", "fold_prefill"))
def generate(model, params, images: jnp.ndarray, rng: jax.Array,
             steps: int = 101, top_k: int = 0, top_p: float = 1.0,
             greedy: bool = True, conf_every: int = 4,
             temperature: float = 1.0, early_exit: bool = True,
             compact_to: int = 0, fold_prefill: bool = False
             ) -> GenerateResult:
    """Batch generation. images: (B, H, W, 3). Returns token sequences seeded
    with BOS, matching ``generate`` (inference_p.py:69-90) behavior.

    ``early_exit=True`` stops the decode loop as soon as every row has
    emitted EOS (a lax.while_loop instead of a fixed-trip scan).  The
    reference keeps generating to the full budget and relies on postprocess
    to cut at the first EOS (inference_p.py:94-97); since rows are frozen at
    PAD after EOS here, early exit is output-identical and ~4x faster on
    GC10-length (~21 token) sequences.
    """
    if fold_prefill and getattr(model.decoder, "prepend_bos", True):
        mem_kvs, _ = prepare_memory_folded_from_images(model, params, images)
        return generate_from_memory(model, params, None, rng, steps=steps,
                                    top_k=top_k, top_p=top_p, greedy=greedy,
                                    conf_every=conf_every,
                                    temperature=temperature,
                                    early_exit=early_exit,
                                    compact_to=compact_to, mem_kvs=mem_kvs)
    encoder_out = model.apply(params, images, method="encode")
    if not getattr(model.decoder, "prepend_bos", True):
        # Axial variant: its attention block runs non-causally over the whole
        # padded target (axial_model.py:101-103) — every position's embedding
        # depends on all positions, so KV caching would change outputs.
        # Generate through full predict re-forwards, like the reference.
        return _generate_uncached(model, params, encoder_out, rng,
                                  steps=steps, top_k=top_k, top_p=top_p,
                                  greedy=greedy, conf_every=conf_every,
                                  temperature=temperature,
                                  early_exit=early_exit)
    return generate_from_memory(model, params, encoder_out, rng, steps=steps,
                                top_k=top_k, top_p=top_p, greedy=greedy,
                                conf_every=conf_every,
                                temperature=temperature,
                                early_exit=early_exit,
                                compact_to=compact_to)


def _generate_uncached(model, params, encoder_out, rng, steps, top_k, top_p,
                       greedy, conf_every, temperature, early_exit):
    """Full-forward generation for decoders whose target mixing is not
    causal (axial variant): each step runs ``predict`` on the PAD-padded
    prefix (static shapes; the reference's own inference cost model)."""
    decoder = model.decoder
    batch = encoder_out.shape[0]
    width = decoder.max_len - 1
    steps = min(steps, width - 1)
    n_confs = (steps + conf_every - 1) // conf_every

    tokens0 = jnp.full((batch, width), PAD_ID, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(BOS_ID)
    confs0 = jnp.zeros((batch, steps), jnp.float32)

    def cond_fn(state):
        i, _, finished, _, _ = state
        not_done = jnp.logical_not(jnp.all(finished)) if early_exit else True
        return (i < steps) & not_done

    def body_fn(state):
        i, tokens, finished, confs, rng = state
        out = model.apply(params, encoder_out, tokens,
                          method=lambda m, e, t: m.decoder.predict(e, t))
        # prefix holds i+1 real tokens; next-token logits sit at
        # output_with_bos[:, i+1] (== raw logits at position i)
        idx = (i + 1)[None, None, None].astype(jnp.int32).repeat(batch, 0)
        logits = jnp.take_along_axis(out, idx, axis=1)[:, 0] / temperature
        filtered = top_k_top_p_filtering(logits, top_k, top_p)
        probs = jax.nn.softmax(filtered, axis=-1)
        conf = jnp.max(probs, axis=-1)
        if greedy:
            nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        else:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, filtered, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        finished = finished | (nxt == EOS_ID)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        confs = jax.lax.dynamic_update_slice(confs, conf[:, None], (0, i))
        return (i + 1, tokens, finished, confs, rng)

    state = (jnp.array(0, jnp.int32), tokens0, jnp.zeros((batch,), bool),
             confs0, rng)
    state = jax.lax.while_loop(cond_fn, body_fn, state)
    tokens, confs = state[1], state[3]
    return GenerateResult(tokens=tokens[:, : steps + 1],
                          confs=confs[:, ::conf_every][:, :n_confs])


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "top_k", "top_p", "greedy",
                     "conf_every", "temperature", "early_exit",
                     "compact_to"))
def generate_from_memory(model, params, encoder_out, rng: jax.Array,
                         steps: int = 101, top_k: int = 0,
                         top_p: float = 1.0, greedy: bool = True,
                         conf_every: int = 4, temperature: float = 1.0,
                         early_exit: bool = True, compact_to: int = 0,
                         mem_kvs=None) -> GenerateResult:
    """Generation from a precomputed encoder output (B, N, D) — used by the
    context-parallel streaming path where encoding happens under shard_map.

    ``compact_to > 0`` (greedy + early_exit only): once <= compact_to rows
    remain unfinished, the survivors (and their caches + cross K/V) are
    gathered into a compact batch and the tail steps stream compact_to/B of
    the HBM bytes.  Tokens and pre-EOS confidences are identical — rows are
    moved, never re-decoded; post-EOS conf slots (PAD-step junk the
    uncompacted loop keeps recording, never read by postprocess) become
    zeros.
    """
    decoder = model.decoder
    cache_len = decoder.max_len - 1
    steps = min(steps, cache_len - 1)

    if mem_kvs is None:
        mem_kvs = model.apply(params, encoder_out,
                              method=lambda m, e: m.decoder.prepare_memory(e))
    batch = jax.tree_util.tree_leaves(mem_kvs)[0].shape[0]
    caches = decoder.init_cache(batch, cache_len)

    bos = jnp.full((batch,), BOS_ID, dtype=jnp.int32)
    n_confs = (steps + conf_every - 1) // conf_every
    tokens0 = jnp.full((batch, steps + 1), PAD_ID, jnp.int32).at[:, 0].set(bos)
    confs0 = jnp.zeros((batch, steps), jnp.float32)
    positions = jnp.arange(cache_len)[None, :]

    def make_loop(mem_kvs):
        def cond_fn(state):
            i, _, _, finished, _, _, _ = state
            not_done = (jnp.logical_not(jnp.all(finished)) if early_exit
                        else True)
            return (i < steps) & not_done

        def body_fn(state):
            i, token, caches, finished, tokens, confs, rng = state
            key_valid = ((positions <= i)
                         & jnp.ones((token.shape[0], 1), bool))
            logits, caches = model.apply(
                params, token, i, caches, mem_kvs, key_valid,
                method=lambda m, *a: m.decoder.decode_step(*a))
            logits = logits / temperature
            filtered = top_k_top_p_filtering(logits, top_k, top_p)
            probs = jax.nn.softmax(filtered, axis=-1)
            conf = jnp.max(probs, axis=-1)
            if greedy:
                nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            else:
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(sub, filtered,
                                             axis=-1).astype(jnp.int32)
            # freeze finished rows at PAD so decode sees a clean tail
            nxt = jnp.where(finished, PAD_ID, nxt)
            finished = finished | (nxt == EOS_ID)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                                  (0, i + 1))
            confs = jax.lax.dynamic_update_slice(confs, conf[:, None], (0, i))
            return (i + 1, nxt, caches, finished, tokens, confs, rng)

        return cond_fn, body_fn

    state = (jnp.array(0, jnp.int32), bos, caches,
             jnp.zeros((batch,), bool), tokens0, confs0, rng)
    cond_fn, body_fn = make_loop(mem_kvs)

    # compaction is exactness-preserving only for greedy decoding (the
    # sampling path's per-step categorical draws change shape with batch).
    # ``compact_to``: int (single stage) or descending tuple of stage
    # sizes — each stage gathers the live rows into a smaller batch once
    # few enough remain, so tail steps stream stage/B of the HBM bytes.
    stages = (compact_to,) if isinstance(compact_to, int) else \
        tuple(compact_to)
    stages = [s for s in stages if 0 < s < batch]
    assert stages == sorted(stages, reverse=True), \
        "compaction stages must be descending"
    if not (early_exit and greedy and stages):
        state = jax.lax.while_loop(cond_fn, body_fn, state)
        tokens, confs = state[4], state[5]
        return GenerateResult(tokens=tokens,
                              confs=confs[:, ::conf_every][:, :n_confs])

    idx_abs = jnp.arange(batch)
    res_tokens, res_confs = tokens0, confs0
    cur_mem = mem_kvs
    for tgt in stages:
        def cond_stage(state, _cond=cond_fn, _tgt=tgt):
            return _cond(state) & (jnp.sum(~state[3]) > _tgt)

        state = jax.lax.while_loop(cond_stage, body_fn, state)
        res_tokens = res_tokens.at[idx_abs].set(state[4])
        res_confs = res_confs.at[idx_abs].set(state[5])
        # gather survivors (position counter i is lockstep — carried)
        i, token, caches, finished, tokens, confs, rng = state
        idx = jnp.argsort(finished.astype(jnp.int32))[:tgt]
        idx_abs = jnp.take(idx_abs, idx)
        take = lambda x, _idx=idx: jnp.take(x, _idx, axis=0)
        cur_mem = jax.tree_util.tree_map(take, cur_mem)
        state = (i, take(token), jax.tree_util.tree_map(take, caches),
                 take(finished), take(tokens), take(confs), rng)
        cond_fn, body_fn = make_loop(cur_mem)

    state = jax.lax.while_loop(cond_fn, body_fn, state)
    res_tokens = res_tokens.at[idx_abs].set(state[4])
    res_confs = res_confs.at[idx_abs].set(state[5])
    return GenerateResult(tokens=res_tokens,
                          confs=res_confs[:, ::conf_every][:, :n_confs])


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "top_k", "top_p", "greedy",
                     "conf_every", "temperature", "early_exit", "chunk"))
def generate_megakernel(model, params, encoder_out, rng, steps: int = 101,
                        top_k: int = 0, top_p: float = 1.0,
                        greedy: bool = True, conf_every: int = 4,
                        temperature: float = 1.0, early_exit: bool = False,
                        chunk: int = 32):
    """EXPERIMENTAL fixed-budget decode: each step is ONE pallas_call over
    the whole decoder stack with int8 K/V + int8 weight streaming
    (ops/megakernel.py).  Sampling semantics match generate_from_memory.

    Measured at flagship B=256 (docs/PERF.md round 3): 1.09x over the XLA
    path at the FULL generation budget, but 0.95x on the trained early-exit
    serving workload (int8 weight perturbation extends the all-rows-finished
    tail) — so this is deliberately NOT reachable from ``generate()``; the
    serving default is the exact XLA bf16 path (+ speculative decoding).
    Kept as a measured, tested experiment (tests/test_megakernel.py,
    benchmarks/bench_megakernel.py)."""
    from mdcnet_tpu.ops import megakernel as mk

    decoder = model.decoder
    assert getattr(decoder, "prepend_bos", True), \
        "megakernel path requires the standard causal decoder"
    p = params["params"]["decoder"] if "params" in params else \
        params["decoder"]
    batch = encoder_out.shape[0]
    cache_len = decoder.max_len - 1
    steps = min(steps, cache_len - 1)
    heads, dim, nl = decoder.num_heads, decoder.dim, decoder.num_layers
    mem_len = decoder.encoder_length
    chunk = min(chunk, batch)
    while batch % chunk:
        chunk //= 2

    stack = mk.stack_decoder_weights(p, nl)

    # cross-attention memory K/V, quantized once (memory + its pos embed)
    memory = encoder_out.astype(jnp.float32) + \
        jnp.asarray(p["encoder_pos_embed"], jnp.float32)
    mem_kvs = []
    for i in range(nl):
        att = p[f"layer{i}"]["cross_attn"]
        def proj(name):
            y = memory @ jnp.asarray(att[name]["kernel"], jnp.float32) + \
                jnp.asarray(att[name]["bias"], jnp.float32)
            return y.reshape(batch, mem_len, heads, dim // heads
                             ).transpose(0, 2, 1, 3)
        mem_kvs.append((proj("k_proj"), proj("v_proj")))
    mem_pad = mem_len + (-mem_len) % 8
    mem_kv = mk.quantize_stacked(mem_kvs, mem_pad)

    cache_pad = cache_len + (-cache_len) % 8
    self_kv = mk.init_stacked_cache(nl, batch, heads, cache_pad,
                                    dim // heads)

    emb = jnp.asarray(p["embedding"]["embedding"], jnp.float32)
    pos_embed = jnp.asarray(p["decoder_pos_embed"], jnp.float32)[0]
    w_out = jnp.asarray(p["output"]["kernel"], jnp.float32)
    b_out = jnp.asarray(p["output"]["bias"], jnp.float32)

    bos = jnp.full((batch,), BOS_ID, dtype=jnp.int32)
    n_confs = (steps + conf_every - 1) // conf_every
    tokens0 = jnp.full((batch, steps + 1), PAD_ID, jnp.int32
                       ).at[:, 0].set(bos)
    confs0 = jnp.zeros((batch, steps), jnp.float32)

    def cond_fn(state):
        i, _, _, finished, _, _, _ = state
        not_done = jnp.logical_not(jnp.all(finished)) if early_exit else True
        return (i < steps) & not_done

    def body_fn(state):
        i, token, self_kv, finished, tokens, confs, rng = state
        x = emb[token] + jax.lax.dynamic_slice(pos_embed, (i, 0), (1, dim))
        x_out, k_new, v_new, k_sc, v_sc = mk.fused_decode_step(
            stack, x, self_kv, mem_kv, i, num_layers=nl, heads=heads,
            mem_len=mem_len, chunk=chunk)
        self_kv = mk.update_stacked_cache(self_kv, k_new, v_new,
                                          k_sc, v_sc, i)
        logits = (x_out @ w_out + b_out) / temperature
        filtered = top_k_top_p_filtering(logits, top_k, top_p)
        probs = jax.nn.softmax(filtered, axis=-1)
        conf = jnp.max(probs, axis=-1)
        if greedy:
            nxt = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        else:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, filtered,
                                         axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, PAD_ID, nxt)
        finished = finished | (nxt == EOS_ID)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                              (0, i + 1))
        confs = jax.lax.dynamic_update_slice(confs, conf[:, None], (0, i))
        return (i + 1, nxt, self_kv, finished, tokens, confs, rng)

    state = (jnp.array(0, jnp.int32), bos, self_kv,
             jnp.zeros((batch,), bool), tokens0, confs0, rng)
    state = jax.lax.while_loop(cond_fn, body_fn, state)
    tokens, confs = state[4], state[5]
    return GenerateResult(tokens=tokens,
                          confs=confs[:, ::conf_every][:, :n_confs])


def postprocess(batch_preds: np.ndarray, batch_confs: np.ndarray, tokenizer
                ) -> Tuple[List, List, List, List]:
    """EOS structure gate + decode (inference_p.py:93-115, caption-aware
    variant inference_trail_after_good_map.py:50-76).

    Returns (bboxes, labels, captions, confs) per image; None entries where
    the structure check fails.
    """
    batch_preds = np.asarray(batch_preds)
    eos_hit = batch_preds == EOS_ID
    eos_idxs = np.where(eos_hit.any(axis=1), eos_hit.argmax(axis=1), 0)
    invalid = (eos_idxs - 1) % 5 != 0
    eos_idxs = np.where(invalid, 0, eos_idxs)

    all_bboxes, all_labels, all_captions, all_confs = [], [], [], []
    for i, eos_idx in enumerate(eos_idxs.tolist()):
        if eos_idx == 0:
            all_bboxes.append(None)
            all_labels.append(None)
            all_captions.append(None)
            all_confs.append(None)
            continue
        labels, bboxes, caption = tokenizer.decode(batch_preds[i, :eos_idx + 1])
        confs = [round(float(batch_confs[i][j]), 3)
                 for j in range(min(len(bboxes), batch_confs.shape[1]))]
        all_bboxes.append(bboxes)
        all_labels.append(labels)
        all_captions.append(caption)
        all_confs.append(confs)
    return all_bboxes, all_labels, all_captions, all_confs
