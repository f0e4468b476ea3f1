"""Exactness-preserving speculative decoding for the caption sequence.

GC10 captions are template text ("The defect {class} is located at the
{position} of the image.") followed by a fixed structural tail
[CAP_END, label, x0, y0, x1, y1, EOS] (data_processing.py:264-290) — well
over half the ~21 generated tokens are deterministic given their prefix.
Greedy decoding still pays one full KV-cached decoder step per token, and
each step's cost is dominated by streaming the cross-attention K/V + cache
from HBM, not by the single token's compute (docs/PERF.md).

This module drafts K-1 cheap guesses per step and verifies them in ONE
multi-token decoder call (``decode_block``): per verify step each row
commits 1 + (length of the matching draft prefix) tokens.  Verification
accepts exactly the argmax of the verify call's own logits, so mismatched
drafts only cost speed, never output (tests/test_speculative.py).

Exactness caveat: ``decode_block`` computes logits with K-row matmuls
whose bf16 accumulation order differs from ``decode_step``'s single-row
ones, so on TPU the two paths can break argmax ties differently —
measured 99.90% token agreement with ``generate(greedy=True)`` at
flagship B=256 (bit-exact in f32/CPU, where the suite pins it).  The
committed sequence is self-consistent greedy decoding either way.

The drafter is data-derived and runs entirely on device:
  - a trigram table (argmax next-token by (prev2, prev1)) built from the
    training annotations, with bigram backoff — this nails the caption
    template words;
  - a copy rule: the label token after CAP_END equals the class word
    already emitted inside the caption (same vocabulary id window 258-267,
    data_processing.py:17-33), so it is drafted by copying;
  - a structure rule: the 5th token after CAP_END (after label + 4 coords)
    is drafted as EOS.
Box coordinate tokens are genuinely content-bearing and stay sequential.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, EOS_ID, LABEL_END,
                               LABEL_START, PAD_ID)
from mdcnet_tpu.infer.generate import GenerateResult
from mdcnet_tpu.ops.sampling import top_k_top_p_filtering


class DraftTables(NamedTuple):
    """Dense next-token argmax tables; -1 where the context was never seen."""
    trigram: jnp.ndarray   # (V, V) int32: [prev2, prev1] -> next or -1
    bigram: jnp.ndarray    # (V,) int32: [prev1] -> next or -1


def build_draft_tables(sequences: Sequence[np.ndarray],
                       vocab_size: int) -> DraftTables:
    """Count-based argmax tables from tokenized training sequences (each a
    1-D int array, PAD-tailed; counted up to and including the first EOS)."""
    from collections import Counter

    tri: dict = {}
    bi: dict = {}
    for seq in sequences:
        seq = np.asarray(seq)
        eos = np.flatnonzero(seq == EOS_ID)
        end = int(eos[0]) + 1 if eos.size else len(seq)
        s = seq[:end]
        # drafting is best-effort: ids outside the model vocabulary (e.g.
        # unresized pixel coords) are skipped, never counted
        ok = (s >= 0) & (s < vocab_size)
        for i in range(1, len(s)):
            if not (ok[i] and ok[i - 1]):
                continue
            bi.setdefault(int(s[i - 1]), Counter())[int(s[i])] += 1
            if i >= 2 and ok[i - 2]:
                tri.setdefault((int(s[i - 2]), int(s[i - 1])),
                               Counter())[int(s[i])] += 1
    tri_tab = np.full((vocab_size, vocab_size), -1, np.int32)
    for (a, b), ctr in tri.items():
        tri_tab[a, b] = ctr.most_common(1)[0][0]
    bi_tab = np.full((vocab_size,), -1, np.int32)
    for a, ctr in bi.items():
        bi_tab[a] = ctr.most_common(1)[0][0]
    return DraftTables(jnp.asarray(tri_tab), jnp.asarray(bi_tab))


def draft_tokens(tables: DraftTables, prev2: jnp.ndarray, prev: jnp.ndarray,
                 cls_tok: jnp.ndarray, since_cap_end: jnp.ndarray, k: int,
                 recycled: jnp.ndarray | None = None) -> jnp.ndarray:
    """Roll the drafter automaton k-1 steps.  All args (B,).  Returns
    drafts (B, k-1).  Shared by batch generation (below) and the
    continuous-batching serving engine (serve/engine.py).

    ``recycled`` (B, k-1, -1 = absent): the previous verify call's argmax
    logits beyond its commit point.  Those are the MODEL's own predictions
    (computed with at most a few wrong draft tokens in the prefix) and beat
    the n-gram tables wherever the next token is image-conditioned — above
    all the four box-coordinate slots, which the trigram can only draft as
    the global mode.  Recycled drafts override the tables; the structural
    rules (label copy after CAP_END, EOS five tokens later), which are
    exact given a committed prefix, override both."""

    def step(carry, rec):
        p2, p1, since = carry
        nxt = tables.trigram[p2, p1]
        nxt = jnp.where(nxt < 0, tables.bigram[p1], nxt)
        nxt = jnp.where(nxt < 0, PAD_ID, nxt)
        # model-recycled draft beats the n-gram tables where present
        nxt = jnp.where(rec >= 0, rec, nxt)
        # structural tail: CAP_END -> copied class label; 5 tokens after
        # CAP_END (label + 4 coords emitted) -> EOS
        nxt = jnp.where(p1 == CAPTION_END_ID, cls_tok, nxt)
        nxt = jnp.where(since == 5, EOS_ID, nxt)
        nxt = jnp.where((p1 == EOS_ID) | (p1 == PAD_ID), PAD_ID, nxt)
        since = jnp.where(nxt == CAPTION_END_ID, 0,
                          jnp.where(since >= 0, since + 1, since))
        return (p1, nxt, since), nxt

    if recycled is None:
        recycled = jnp.full((prev.shape[0], k - 1), -1, jnp.int32)
    since0 = jnp.where(prev == CAPTION_END_ID, 0, since_cap_end)
    # unroll: k-1 <= 7 steps of tiny (B,) gathers/selects — unrolled they
    # fuse into a handful of kernels instead of a sequential scan whose
    # per-iteration op latency (~50 us/op on this toolchain) adds up
    _, drafts = jax.lax.scan(step, (prev2, prev, since0),
                             recycled.T.astype(jnp.int32), unroll=True)
    return drafts.T        # (B, k-1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "draft_k", "top_k", "top_p",
                     "conf_every", "temperature", "block_impl",
                     "compact_to", "fold_prefill", "recycle_shift"))
def generate_speculative(model, params, images: jnp.ndarray,
                         tables: DraftTables, steps: int = 101,
                         draft_k: int = 8, top_k: int = 0,
                         top_p: float = 1.0, conf_every: int = 4,
                         temperature: float = 1.0,
                         block_impl: str = "split",
                         compact_to: int = 0,
                         fold_prefill: bool = False,
                         recycle_shift: bool = True) -> GenerateResult:
    """Greedy generation with draft-K verification; output tokens identical
    to ``generate(greedy=True, early_exit=True)``; confidences identical at
    every committed (pre-EOS) position."""
    if fold_prefill:
        from mdcnet_tpu.infer.generate import prepare_memory_folded_from_images
        mem_kvs, _ = prepare_memory_folded_from_images(model, params, images)
        return generate_speculative_from_memory(
            model, params, None, tables, steps=steps, draft_k=draft_k,
            top_k=top_k, top_p=top_p, conf_every=conf_every,
            temperature=temperature, block_impl=block_impl,
            compact_to=compact_to, mem_kvs=mem_kvs,
            recycle_shift=recycle_shift)
    encoder_out = model.apply(params, images, method="encode")
    return generate_speculative_from_memory(
        model, params, encoder_out, tables, steps=steps, draft_k=draft_k,
        top_k=top_k, top_p=top_p, conf_every=conf_every,
        temperature=temperature, block_impl=block_impl,
        compact_to=compact_to, recycle_shift=recycle_shift)


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "draft_k", "top_k", "top_p",
                     "conf_every", "temperature", "block_impl",
                     "compact_to", "recycle_shift"))
def generate_speculative_from_memory(model, params, encoder_out,
                                     tables: DraftTables, steps: int = 101,
                                     draft_k: int = 8, top_k: int = 0,
                                     top_p: float = 1.0, conf_every: int = 4,
                                     temperature: float = 1.0,
                                     block_impl: str = "split",
                                     compact_to: int = 0,
                                     mem_kvs=None,
                                     recycle_shift: bool = True
                                     ) -> GenerateResult:
    """``compact_to > 0``: two-phase raggedness fix.  The while_loop runs to
    the SLOWEST of B rows; rows whose captions draft badly take near-greedy
    block counts while every finished row still pays the full per-block
    cross-K/V + cache HBM stream.  Phase 1 runs at full batch only until
    <= compact_to rows remain unfinished, then the survivors (plus their
    caches and cross-attention K/V) are gathered into a compact_to-row
    batch and decoding resumes there — the tail iterations stream
    compact_to/B of the bytes.  Output tokens/confs are identical: rows are
    only moved, never re-decoded (tests/test_speculative.py)."""
    decoder = model.decoder
    assert getattr(decoder, "prepend_bos", True), \
        "speculative decode requires the standard causal decoder"
    cache_len = decoder.max_len - 1
    steps = min(steps, cache_len - 1)
    k_blk = min(draft_k, steps)
    n_confs = (steps + conf_every - 1) // conf_every

    if mem_kvs is None:
        mem_kvs = model.apply(params, encoder_out,
                              method=lambda m, e: m.decoder.prepare_memory(e))
    batch = jax.tree_util.tree_leaves(mem_kvs)[0].shape[0]
    # +k_blk slack: draft slots beyond the commit point are overwritten by
    # the next block before they ever become attendable
    caches = decoder.init_cache(batch, cache_len + k_blk)

    # one dump column past the live region absorbs masked scatters; the
    # extra k_blk slack columns let the "split_unique" impl write ALL K
    # lanes unconditionally (stale lanes are cleaned up after the loop)
    tokens0 = jnp.full((batch, steps + 1 + k_blk), PAD_ID, jnp.int32
                       ).at[:, 0].set(BOS_ID)
    confs0 = jnp.zeros((batch, steps + k_blk), jnp.float32)

    def make_loop(mem_kvs):
        """cond/body closures for one phase; batch size is taken from the
        state so the same code traces at B and at compact_to."""

        def cond_fn(state):
            return jnp.logical_not(jnp.all(state[4]))

        def body_fn(state):
            (pos, last, prev2, cls_tok, finished, since, recycled, tokens,
             confs, caches, n_iters) = state
            rows = jnp.arange(pos.shape[0])
            drafts = draft_tokens(tables, prev2, last, cls_tok, since, k_blk,
                                  recycled=recycled)
            block = jnp.concatenate([last[:, None], drafts], axis=1)  # (B,K)
            if block_impl.startswith("split"):
                # scatter-free verify: caches stay read-only through the block
                # call; accepted rows are committed once, after acc is known
                logits, blk_kvs = model.apply(
                    params, block, pos, caches, mem_kvs,
                    method=lambda m, *a: m.decoder.decode_block_split(*a))
            else:
                logits, caches = model.apply(
                    params, block, pos, caches, mem_kvs,
                    method=lambda m, *a: m.decoder.decode_block(*a))
            logits = logits / temperature
            filtered = top_k_top_p_filtering(
                logits.reshape(pos.shape[0] * k_blk, -1), top_k, top_p
            ).reshape(pos.shape[0], k_blk, -1)
            probs = jax.nn.softmax(filtered, axis=-1)
            conf = jnp.max(probs, axis=-1)                   # (B, K)
            out = jnp.argmax(filtered, axis=-1).astype(jnp.int32)  # (B, K)

            # committed count: 1 + longest draft prefix that matched AND did not
            # pass an EOS (greedy freezes at PAD after EOS); clamp to the budget
            match = (out[:, :-1] == drafts) & (out[:, :-1] != EOS_ID)
            alive = jnp.cumprod(match.astype(jnp.int32), axis=1)
            acc = 1 + alive.sum(axis=1)                      # (B,) in [1, K]
            acc = jnp.minimum(acc, steps - pos)
            acc = jnp.where(finished, 0, acc)
            if block_impl.startswith("split"):
                # "split" commits via masked scatter, "split_gather" via the
                # vectorized gather+select twin, "split_unique" via the
                # duplicate-free always-write scatter (decoder.commit_blocks)
                caches_new = decoder.commit_blocks(
                    caches, blk_kvs, pos, acc,
                    impl={"split_gather": "gather",
                          "split_unique": "unique"}.get(block_impl,
                                                        "scatter"))
            else:
                caches_new = caches

            j_idx = jnp.arange(k_blk)[None, :]
            commit = j_idx < acc[:, None]                    # (B, K)
            if block_impl == "split_unique":
                # duplicate-free token/conf commit: write ALL K lanes at the
                # row's window (distinct columns — no dump-column duplicates,
                # so XLA:TPU needn't serialize the scatter).  Lanes beyond
                # acc hold wrong-prefix predictions; they are overwritten by
                # the next block's window (acc >= 1 for live rows) and
                # post-loop cleanup PADs everything past the final pos.
                tcol = pos[:, None] + 1 + j_idx
                tokens = tokens.at[rows[:, None], tcol].set(
                    out, unique_indices=True, mode="promise_in_bounds")
                ccol = pos[:, None] + j_idx
                confs = confs.at[rows[:, None], ccol].set(
                    conf, unique_indices=True, mode="promise_in_bounds")
            else:
                # scatter committed tokens/confs; masked lanes hit the dump
                # column
                tcol = jnp.where(commit, pos[:, None] + 1 + j_idx, steps + 1)
                tokens = tokens.at[rows[:, None], tcol].set(
                    jnp.where(commit, out, tokens[rows[:, None], tcol]))
                ccol = jnp.where(commit, pos[:, None] + j_idx, steps)
                confs = confs.at[rows[:, None], ccol].set(
                    jnp.where(commit, conf, confs[rows[:, None], ccol]))

            hit_eos = ((out == EOS_ID) & commit).any(axis=1)
            new_pos = pos + acc
            # committed-token bookkeeping for the next draft round
            last_new = tokens[rows, new_pos]
            prev2_new = tokens[rows, jnp.maximum(new_pos - 1, 0)]
            is_cls = (out >= LABEL_START) & (out <= LABEL_END) & commit
            cap_seen = (out == CAPTION_END_ID) & commit
            # class word inside the caption (before CAP_END) -> copy source
            before_cap = jnp.cumsum(cap_seen.astype(jnp.int32), axis=1) == 0
            cls_in_blk = jnp.where(is_cls & before_cap & (since < 0)[:, None],
                                   out, -1).max(axis=1)
            cls_tok = jnp.where(cls_in_blk >= 0, cls_in_blk, cls_tok)
            # tokens emitted after CAP_END so far (drives the EOS structure rule)
            after = (jnp.cumsum(cap_seen.astype(jnp.int32), axis=1) > 0) & commit
            n_after = (after.sum(axis=1)
                       - cap_seen.any(axis=1).astype(jnp.int32))
            since = jnp.where(cap_seen.any(axis=1), n_after,
                              jnp.where(since >= 0, since + acc, since))
            finished = finished | hit_eos | (new_pos >= steps)
            # recycle verify logits beyond the commit point as next-block drafts:
            # out[:, acc-1+i] predicts the token at position new_pos + i — the
            # model's own guess, one-or-more wrong draft tokens in its prefix
            if k_blk > 1:
                i_slot = jnp.arange(1, k_blk)[None, :]       # (1, K-1)
                src = acc[:, None] - 1 + i_slot              # (B, K-1)
                rec = jnp.take_along_axis(
                    out, jnp.clip(src, 0, k_blk - 1), axis=1)
                avail = (src <= k_blk - 1) & ~finished[:, None] & (rec != PAD_ID)
                recycled = jnp.where(avail, rec, -1)
                if recycle_shift:
                    # Insertion-miss realignment (probe_spec_trace): when the
                    # model INSERTS a token the drafter skipped (correction C,
                    # rejected draft d), the beyond-commit predictions were
                    # conditioned on d as if already consumed — they are the
                    # true continuation shifted one ahead, and plain recycling
                    # cascades at acc=1 until the template resyncs.  Signature,
                    # checkable for free: from the corrected context the n-gram
                    # tables predict exactly the rejected draft (i.e. d was a
                    # plausible next token that C was inserted before).  Then
                    # the aligned drafts are [d, recycled[:-1]].  Word tokens
                    # only (>= LABEL_START): coordinate slots can collide with
                    # the table's global-mode coordinate and fire spuriously.
                    rejected = jnp.take_along_axis(
                        block, jnp.clip(acc, 0, k_blk - 1)[:, None],
                        axis=1)[:, 0]
                    tab = tables.trigram[prev2_new, last_new]
                    tab = jnp.where(tab < 0, tables.bigram[last_new], tab)
                    insertion = ((acc < k_blk) & (tab == rejected)
                                 & (rejected >= LABEL_START) & ~finished)
                    shifted = jnp.concatenate(
                        [rejected[:, None], recycled[:, :-1]], axis=1)
                    recycled = jnp.where(insertion[:, None], shifted, recycled)
            return (new_pos, last_new, prev2_new, cls_tok, finished, since,
                    recycled, tokens, confs, caches_new, n_iters + 1)

        return cond_fn, body_fn

    state = (jnp.zeros((batch,), jnp.int32),            # pos
             jnp.full((batch,), BOS_ID, jnp.int32),     # last committed
             jnp.full((batch,), PAD_ID, jnp.int32),     # prev2
             jnp.full((batch,), PAD_ID, jnp.int32),     # cls copy source
             jnp.zeros((batch,), bool),                 # finished
             jnp.full((batch,), -1, jnp.int32),         # tokens since CAP_END
             jnp.full((batch, max(k_blk - 1, 0)), -1, jnp.int32),  # recycled
             tokens0, confs0, caches,
             jnp.zeros((), jnp.int32))                  # verify-block count
    cond_fn, body_fn = make_loop(mem_kvs)

    def cleanup(tokens, confs, final_pos):
        """split_unique writes all K lanes each block; PAD/zero everything
        past each row's final committed position (exactly the region the
        masked impls never write)."""
        if block_impl != "split_unique":
            return tokens, confs
        t_col = jnp.arange(tokens.shape[1])[None, :]
        tokens = jnp.where(t_col <= final_pos[:, None], tokens, PAD_ID)
        c_col = jnp.arange(confs.shape[1])[None, :]
        confs = jnp.where(c_col < final_pos[:, None], confs, 0.0)
        return tokens, confs

    # compaction ladder: ``compact_to`` is an int (single stage, the
    # historical API) or a descending tuple of stage sizes.  Each stage
    # runs the loop until <= stage rows remain live, writes the current
    # rows' results back into the full-size buffers, gathers the
    # survivors (plus caches and cross K/V) into a stage-row batch, and
    # continues — tail iterations stream stage/B of the HBM bytes.
    # Output tokens/confs identical: rows are only moved, never
    # re-decoded (tests/test_speculative.py).
    stages = (compact_to,) if isinstance(compact_to, int) else \
        tuple(compact_to)
    stages = [s for s in stages if 0 < s < batch]
    assert stages == sorted(stages, reverse=True), \
        "compaction stages must be descending"

    if not stages:
        state = jax.lax.while_loop(cond_fn, body_fn, state)
        tokens, confs = cleanup(state[7], state[8], state[0])
        return GenerateResult(
            tokens=tokens[:, : steps + 1],
            confs=confs[:, :steps][:, ::conf_every][:, :n_confs],
            n_iters=state[10])

    idx_abs = jnp.arange(batch)
    res_tokens, res_confs = tokens0, confs0
    res_pos = jnp.zeros((batch,), jnp.int32)
    cur_mem = mem_kvs
    for tgt in stages:
        def cond_stage(state, _cond=cond_fn, _tgt=tgt):
            return _cond(state) & (jnp.sum(~state[4]) > _tgt)

        state = jax.lax.while_loop(cond_stage, body_fn, state)
        # park this stage's results (finished rows drop out of the gather)
        res_tokens = res_tokens.at[idx_abs].set(state[7])
        res_confs = res_confs.at[idx_abs].set(state[8])
        res_pos = res_pos.at[idx_abs].set(state[0])
        # gather survivors (stable sort: unfinished first)
        order = jnp.argsort(state[4].astype(jnp.int32))
        idx = order[:tgt]
        idx_abs = jnp.take(idx_abs, idx)
        take = lambda x, _idx=idx: jnp.take(x, _idx, axis=0)
        cur_mem = jax.tree_util.tree_map(take, cur_mem)
        # every leaf of the state except the scalar n_iters has a leading
        # batch dim (caches are (B, H, L, Dh) lists-of-pairs)
        state = tuple(jax.tree_util.tree_map(take, s)
                      for s in state[:-1]) + (state[-1],)
        cond_fn, body_fn = make_loop(cur_mem)

    state = jax.lax.while_loop(cond_fn, body_fn, state)
    res_tokens = res_tokens.at[idx_abs].set(state[7])
    res_confs = res_confs.at[idx_abs].set(state[8])
    res_pos = res_pos.at[idx_abs].set(state[0])
    tokens, confs = cleanup(res_tokens, res_confs, res_pos)
    return GenerateResult(
        tokens=tokens[:, : steps + 1],
        confs=confs[:, :steps][:, ::conf_every][:, :n_confs],
        n_iters=state[10])
