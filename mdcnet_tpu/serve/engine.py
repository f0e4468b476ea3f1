"""Continuous-batching serving engine around the KV-cached decode.

The reference serves inference as offline whole-split batch loops
(inference_p.py:69-115): every image in a batch decodes to the full budget
and the batch only completes when its longest sequence does.  Under live
traffic that wastes most decode slots — GC10 captions span ~11-26 tokens,
so a static batch burns up to 2x its useful work on finished rows.

This engine keeps a fixed pool of ``slots`` decode lanes resident on the
TPU and streams requests through them:

  - every slot decodes at its OWN depth (``decode_step`` with a (B,)
    position vector — each row's K/V scatter and pos-embed lookup is
    per-row);
  - a row that emits EOS frees its slot; the next queued request is
    admitted into it without disturbing the other rows (its cross-attention
    memory K/V are scattered into the slot; stale self-attention cache
    beyond the row's position is masked off by ``key_valid``);
  - decode advances in jitted ``segment_steps``-step lax.scan segments;
    admission happens between segments (one host round-trip per segment,
    ~32 ms over a remote tunnel — segments amortize it);
  - newcomer images are encoded in fixed-width ``admit_width`` batches so
    the encoder compiles exactly once.

Greedy decode is token-identical to ``infer.generate`` on the same images
(tests/test_serve.py asserts it), so the EOS structure gate and tokenizer
postprocess apply unchanged.
"""
from __future__ import annotations

import collections
import time
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, EOS_ID, LABEL_END,
                               LABEL_START, PAD_ID)


class Request(NamedTuple):
    rid: int
    image: np.ndarray          # (H, W, 3) uint8 or float
    arrival: float = 0.0       # seconds since serve() start


class Completion(NamedTuple):
    rid: int
    tokens: np.ndarray         # (steps+1,) BOS-seeded, PAD after EOS
    latency: float             # completion - arrival (s)
    queued: float              # admission - arrival (s)


class _DeviceState(NamedTuple):
    token: jnp.ndarray         # (B,) current input token per slot
    pos: jnp.ndarray           # (B,) next cache position per slot
    caches: list               # per-layer (k, v) self-attention caches
    mem_kvs: list              # per-layer (k, v) cross-attention memory
    active: jnp.ndarray        # (B,) slot holds a request
    finished: jnp.ndarray      # (B,) slot's request has emitted EOS
    buf: jnp.ndarray           # (B, max_steps+1) emitted tokens
    # speculative-mode drafter bookkeeping (dead weight in greedy mode)
    prev2: jnp.ndarray         # (B,) token before the current one
    cls_tok: jnp.ndarray       # (B,) class word seen inside the caption
    since: jnp.ndarray         # (B,) tokens emitted since CAP_END (-1: none)


class ServingEngine:
    """Continuous batching over the flagship encoder-decoder.

    Parameters
    ----------
    model, params : the encdec model (standard causal decoder, unquantized
        KV caches — per-row positions need the dense cache) and its params.
    slots : resident decode lanes (the TPU batch).
    admit_width : newcomer encode batch; admission pads to this width so
        the encoder compiles once.
    segment_steps : decode steps per jitted segment (host sync cadence).
        In speculative mode each step is a draft-K verify round committing
        1..draft_k tokens per live slot, so segments cover more sequence.
    max_steps : decode budget per request (default: cache capacity).
    draft_tables : optional ``infer.speculative.DraftTables``; when given,
        segments advance via K-token draft verification (``decode_block``)
        instead of one ``decode_step`` per token — same-greedy output up to
        bf16 argmax ties (99.9% token agreement at flagship; bit-exact in
        f32/CPU, tests/test_serve.py), fewer decoder calls per caption.
    draft_k : verify block width (last committed token + draft_k-1 drafts).
    commit_impl : cache-commit lowering for speculative segments
        ("unique" default: duplicate-free always-write scatter — stale lanes
        are never attendable and are overwritten by the next block;
        "scatter"/"gather" are the masked twins, see
        ``CaptionDecoder.commit_blocks``).  Output-identical.
    """

    def __init__(self, model, params, slots: int = 64, admit_width: int = 16,
                 segment_steps: int = 8, max_steps: Optional[int] = None,
                 img_size: int = 224, draft_tables=None, draft_k: int = 8,
                 commit_impl: str = "unique"):
        decoder = model.decoder
        assert getattr(decoder, "prepend_bos", True), \
            "serving requires the standard causal decoder"
        assert not decoder.kv_quant, \
            "serving uses per-row cache positions (dense caches)"
        self.model = model
        self.params = params
        self.slots = slots
        self.admit_width = min(admit_width, slots)
        self.segment_steps = segment_steps
        self.cache_len = decoder.max_len - 1
        self.max_steps = min(max_steps or self.cache_len - 1,
                             self.cache_len - 1)
        self.img_size = img_size
        self.draft_tables = draft_tables
        self.draft_k = draft_k
        self.commit_impl = commit_impl
        self._build()
        self._reset()

    # ------------------------------------------------------------------ #
    # jitted device programs (each compiles once)
    # ------------------------------------------------------------------ #
    def _build(self):
        model, B = self.model, self.slots
        A, K, L = self.admit_width, self.segment_steps, self.cache_len
        max_steps = self.max_steps
        size = self.img_size

        @jax.jit
        def encode_prepare(params, images):
            """(A, H, W, 3) float in [0, 255] -> per-layer memory K/V
            (preprocess normalizes, like every other inference path)."""
            from mdcnet_tpu.data.augment import preprocess
            images = preprocess(images, jax.random.PRNGKey(0), size,
                                train=False)
            enc = model.apply(params, images, method="encode")
            return model.apply(
                params, enc, method=lambda m, e: m.decoder.prepare_memory(e))

        @jax.jit
        def admit(state: _DeviceState, slot_idx, new_mem):
            """Scatter ``new_mem`` rows into ``slot_idx`` lanes and reset
            them; invalid entries carry slot_idx == B (out of bounds) and
            are dropped by the scatter."""
            mem_kvs = jax.tree_util.tree_map(
                lambda m, n: m.at[slot_idx].set(n, mode="drop"),
                state.mem_kvs, new_mem)
            row = jnp.full((max_steps + 1,), PAD_ID,
                           jnp.int32).at[0].set(BOS_ID)
            return state._replace(
                mem_kvs=mem_kvs,
                token=state.token.at[slot_idx].set(BOS_ID, mode="drop"),
                pos=state.pos.at[slot_idx].set(0, mode="drop"),
                active=state.active.at[slot_idx].set(True, mode="drop"),
                finished=state.finished.at[slot_idx].set(False, mode="drop"),
                buf=state.buf.at[slot_idx].set(row, mode="drop"),
                prev2=state.prev2.at[slot_idx].set(PAD_ID, mode="drop"),
                cls_tok=state.cls_tok.at[slot_idx].set(PAD_ID, mode="drop"),
                since=state.since.at[slot_idx].set(-1, mode="drop"))

        positions = jnp.arange(L)[None, :]
        rows = jnp.arange(B)

        @jax.jit
        def segment(params, state: _DeviceState) -> _DeviceState:
            """Advance every live slot ``K`` tokens (one compiled program)."""

            def body(carry, _):
                token, pos, caches, finished, buf = carry
                key_valid = positions <= pos[:, None]
                logits, caches = model.apply(
                    params, token, pos, caches, state.mem_kvs, key_valid,
                    method=lambda m, *a: m.decoder.decode_step(*a))
                live = state.active & ~finished
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(live, nxt, PAD_ID)
                finished = finished | (live & ((nxt == EOS_ID) |
                                               (pos + 1 >= max_steps)))
                # frozen rows re-write their own value at column 0 (no-op)
                idx = jnp.where(live, pos + 1, 0)
                val = jnp.where(live, nxt, buf[:, 0])
                buf = buf.at[rows, idx].set(val)
                token = jnp.where(live, nxt, token)
                pos = pos + live.astype(pos.dtype)
                return (token, pos, caches, finished, buf), None

            carry = (state.token, state.pos, state.caches, state.finished,
                     state.buf)
            carry, _ = jax.lax.scan(body, carry, None, length=K)
            token, pos, caches, finished, buf = carry
            return state._replace(token=token, pos=pos, caches=caches,
                                  finished=finished, buf=buf)

        tables, kq = self.draft_tables, self.draft_k

        @jax.jit
        def segment_spec(params, state: _DeviceState) -> _DeviceState:
            """Advance every live slot ``K`` draft-verify rounds, each
            committing 1..draft_k greedy-exact tokens (infer/speculative.py
            semantics with per-slot positions + activity masking)."""
            from mdcnet_tpu.infer.speculative import draft_tokens

            j_idx = jnp.arange(kq)[None, :]

            def body(carry, _):
                (token, pos, prev2, cls_tok, since, caches, finished,
                 buf) = carry
                live = state.active & ~finished
                drafts = draft_tokens(tables, prev2, token, cls_tok, since,
                                      kq)
                block = jnp.concatenate([token[:, None], drafts], axis=1)
                # scatter-free verify (decode_block_split): caches stay
                # read-only; accepted rows are committed once acc is known
                logits, blk_kvs = model.apply(
                    params, block, pos, caches, state.mem_kvs,
                    method=lambda m, *a: m.decoder.decode_block_split(*a))
                out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                match = (out[:, :-1] == drafts) & (out[:, :-1] != EOS_ID)
                alive = jnp.cumprod(match.astype(jnp.int32), axis=1)
                acc = 1 + alive.sum(axis=1)
                acc = jnp.minimum(acc, max_steps - pos)
                acc = jnp.where(live, acc, 0)
                caches = model.decoder.commit_blocks(caches, blk_kvs, pos,
                                                     acc,
                                                     impl=self.commit_impl)
                commit = j_idx < acc[:, None]
                # masked lanes index one past the row end -> dropped
                tcol = jnp.where(commit, pos[:, None] + 1 + j_idx,
                                 max_steps + 1)
                buf = buf.at[rows[:, None], tcol].set(
                    jnp.where(commit, out, PAD_ID), mode="drop")
                hit_eos = ((out == EOS_ID) & commit).any(axis=1)
                new_pos = pos + acc
                token = buf[rows, new_pos]
                prev2 = buf[rows, jnp.maximum(new_pos - 1, 0)]
                # drafter bookkeeping (mirrors generate_speculative)
                is_cls = ((out >= LABEL_START) & (out <= LABEL_END)
                          & commit)
                cap_seen = (out == CAPTION_END_ID) & commit
                before = jnp.cumsum(cap_seen.astype(jnp.int32), axis=1) == 0
                cls_blk = jnp.where(
                    is_cls & before & (since < 0)[:, None], out,
                    -1).max(axis=1)
                cls_tok = jnp.where(cls_blk >= 0, cls_blk, cls_tok)
                after = ((jnp.cumsum(cap_seen.astype(jnp.int32), axis=1)
                          > 0) & commit)
                n_after = (after.sum(axis=1)
                           - cap_seen.any(axis=1).astype(jnp.int32))
                since = jnp.where(cap_seen.any(axis=1), n_after,
                                  jnp.where(since >= 0, since + acc, since))
                finished = finished | (live & (hit_eos |
                                               (new_pos >= max_steps)))
                return (token, new_pos, prev2, cls_tok, since, caches,
                        finished, buf), None

            carry = (state.token, state.pos, state.prev2, state.cls_tok,
                     state.since, state.caches, state.finished, state.buf)
            carry, _ = jax.lax.scan(body, carry, None, length=K)
            (token, pos, prev2, cls_tok, since, caches, finished,
             buf) = carry
            return state._replace(token=token, pos=pos, prev2=prev2,
                                  cls_tok=cls_tok, since=since,
                                  caches=caches, finished=finished, buf=buf)

        self._encode_prepare = encode_prepare
        self._admit = admit
        self._segment = segment if tables is None else segment_spec

    def _reset(self):
        decoder = self.model.decoder
        B, L = self.slots, self.cache_len
        # +draft_k slack in speculative mode: draft slots past the commit
        # point are rewritten by the next block before becoming attendable
        slack = self.draft_k if self.draft_tables is not None else 0
        caches = decoder.init_cache(B, L + slack)
        # memory K/V template: encode one admit-width batch of zeros and
        # tile the SHAPE (values are dead until a slot is admitted)
        mem_shapes = jax.eval_shape(
            self._encode_prepare, self.params,
            jnp.zeros((self.admit_width, self.img_size, self.img_size, 3),
                      jnp.float32))
        mem_kvs = jax.tree_util.tree_map(
            lambda s: jnp.zeros((B,) + s.shape[1:], s.dtype), mem_shapes)
        self._state = _DeviceState(
            token=jnp.full((B,), PAD_ID, jnp.int32),
            pos=jnp.zeros((B,), jnp.int32),
            caches=caches,
            mem_kvs=mem_kvs,
            active=jnp.zeros((B,), bool),
            finished=jnp.zeros((B,), bool),
            buf=jnp.full((B, self.max_steps + 1), PAD_ID, jnp.int32),
            prev2=jnp.full((B,), PAD_ID, jnp.int32),
            cls_tok=jnp.full((B,), PAD_ID, jnp.int32),
            since=jnp.full((B,), -1, jnp.int32))
        self._slot_req: List[Optional[Request]] = [None] * B
        self._slot_admit_t: List[float] = [0.0] * B

    # ------------------------------------------------------------------ #
    # host loop
    # ------------------------------------------------------------------ #
    def serve(self, requests: Sequence[Request],
              progress_every: int = 0) -> List[Completion]:
        """Run the engine until every request completes.  Requests whose
        ``arrival`` lies in the future (relative to serve() start) queue
        until their time comes — an open-loop load generator."""
        t0 = time.perf_counter()
        pending = collections.deque(
            sorted(requests, key=lambda r: r.arrival))
        completions: List[Completion] = []
        n_total = len(pending)

        while len(completions) < n_total:
            now = time.perf_counter() - t0
            free = [s for s in range(self.slots)
                    if self._slot_req[s] is None]
            # admit newcomers (fixed-width encode batch)
            batch: List[Tuple[int, Request]] = []
            while (pending and pending[0].arrival <= now and free
                   and len(batch) < self.admit_width):
                batch.append((free.pop(0), pending.popleft()))
            if batch:
                imgs = np.zeros((self.admit_width, self.img_size,
                                 self.img_size, 3), np.float32)
                idx = np.full((self.admit_width,), self.slots, np.int32)
                for j, (slot, req) in enumerate(batch):
                    imgs[j] = np.asarray(req.image, np.float32)  # [0, 255]
                    idx[j] = slot
                    self._slot_req[slot] = req
                    self._slot_admit_t[slot] = now
                new_mem = self._encode_prepare(self.params, jnp.asarray(imgs))
                self._state = self._admit(self._state, jnp.asarray(idx),
                                          new_mem)

            occupied = [s for s in range(self.slots)
                        if self._slot_req[s] is not None]
            if not occupied:
                if pending:      # idle until the next arrival
                    time.sleep(max(0.0, pending[0].arrival - now))
                    continue
                break

            self._state = self._segment(self.params, self._state)

            fin = np.asarray(self._state.finished)
            done = [s for s in occupied if fin[s]]
            if done:
                rows = np.asarray(self._state.buf[jnp.asarray(done)])
                t_done = time.perf_counter() - t0
                for j, s in enumerate(done):
                    req = self._slot_req[s]
                    completions.append(Completion(
                        rid=req.rid, tokens=rows[j],
                        latency=t_done - req.arrival,
                        queued=self._slot_admit_t[s] - req.arrival))
                    self._slot_req[s] = None
            if progress_every and len(completions) % progress_every == 0:
                print(f"served {len(completions)}/{n_total}", flush=True)
        return completions


def latency_stats(completions: Sequence[Completion],
                  wall_s: float) -> Dict[str, float]:
    lats = np.array([c.latency for c in completions])
    return {
        "requests": len(completions),
        "wall_s": round(wall_s, 3),
        "throughput_rps": round(len(completions) / wall_s, 1),
        "latency_p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 1),
        "latency_p90_ms": round(float(np.percentile(lats, 90)) * 1e3, 1),
        "latency_p99_ms": round(float(np.percentile(lats, 99)) * 1e3, 1),
        "latency_mean_ms": round(float(lats.mean()) * 1e3, 1),
    }
