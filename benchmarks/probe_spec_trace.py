"""Replay the speculative verify loop step-by-step with full visibility.

Mirrors generate_speculative_from_memory's body (infer/speculative.py) as
a host-level loop over the SAME device ops (decode_block_split + commit),
recording per-iteration: the acc distribution, which slot missed, what
was drafted vs what the model wanted, and whether the failing draft came
from the n-gram tables, the recycle path, or a structure rule.

probe_draft_quality's oracle sim says tables+rules+recycling should take
~6 blocks/row at K=4; the real loop takes 12.  This pinpoints the gap.

Run: python benchmarks/probe_spec_trace.py [--k 4] [--batch 256]
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--max-blocks", type=int, default=40)
    ap.add_argument("--recycle", default="shift", choices=("shift", "plain"))
    args = ap.parse_args()
    n_shift_fired = [0]

    from bench import load_params
    from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, EOS_ID, LABEL_END,
                                   LABEL_START, PAD_ID, large_preset)
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.infer.speculative import build_draft_tables, draft_tokens
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    k_blk = args.k
    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    params, workload, _ = load_params(model, cfg)
    print(f"workload={workload}", file=sys.stderr)
    decoder = model.decoder
    cache_len = decoder.max_len - 1
    steps = min(cfg.infer.generation_steps, cache_len - 1)
    batch = args.batch

    records = ann.txt_file_to_records(
        "/root/reference/annotations_summary.txt", "/img")
    vocab = gc10_vocabulary(records["caption"].tolist())
    tokz = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                        cfg.data.img_size, max_len=cfg.data.max_len)
    seqs = [np.asarray(tokz.process_single_pair(
        int(records["label"][i]),
        [min(float(records[c][i]), float(cfg.data.img_size))
         for c in ("xmin", "ymin", "xmax", "ymax")],
        records["caption"][i])) for i in range(len(records["label"]))]
    tables = build_draft_tables(seqs, cfg.model.vocab_size)
    tri = np.asarray(tables.trigram)
    bi = np.asarray(tables.bigram)
    itos = {i: w for w, i in vocab.stoi.items()} if hasattr(vocab, "stoi") \
        else {}

    def name(t):
        t = int(t)
        return {BOS_ID: "<BOS>", EOS_ID: "<EOS>", PAD_ID: "<PAD>",
                CAPTION_END_ID: "<CAP_END>", 303: "<CAP_START>"}.get(
                    t, itos.get(t, str(t)))

    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (batch, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)
    encoder_out = jax.jit(
        lambda p, im: model.apply(p, im, method="encode"))(params, images)

    prep = jax.jit(lambda p, e: model.apply(
        p, e, method=lambda m, x: m.decoder.prepare_memory(x)))
    mem_kvs = prep(params, encoder_out)

    blk = jax.jit(lambda p, t, pos, c, m: model.apply(
        p, t, pos, c, m,
        method=lambda mm, *a: mm.decoder.decode_block_split(*a)))
    commit = jax.jit(lambda c, bkv, pos, acc: decoder.commit_blocks(
        c, bkv, pos, acc, impl="unique"))
    drafter = jax.jit(lambda p2, p1, cls, since, rec: draft_tokens(
        tables, p2, p1, cls, since, k_blk, recycled=rec))

    caches = decoder.init_cache(batch, cache_len + k_blk)

    pos = np.zeros((batch,), np.int32)
    last = np.full((batch,), BOS_ID, np.int32)
    prev2 = np.full((batch,), PAD_ID, np.int32)
    cls_tok = np.full((batch,), PAD_ID, np.int32)
    finished = np.zeros((batch,), bool)
    since = np.full((batch,), -1, np.int32)
    recycled = np.full((batch, k_blk - 1), -1, np.int32)
    rec_src = np.zeros((batch, k_blk - 1), bool)  # slot drafted via recycle
    tokens = np.full((batch, steps + 1 + k_blk), PAD_ID, np.int32)
    tokens[:, 0] = BOS_ID

    acc_hist = collections.Counter()
    miss_kind = collections.Counter()
    miss_by_srctype = collections.Counter()
    miss_detail = collections.Counter()

    row_blocks = np.zeros((batch,), np.int32)
    for it in range(args.max_blocks):
        if finished.all():
            break
        row_blocks += (~finished).astype(np.int32)
        since0 = np.where(last == CAPTION_END_ID, 0, since)
        drafts = np.asarray(drafter(jnp.asarray(prev2), jnp.asarray(last),
                                    jnp.asarray(cls_tok), jnp.asarray(since),
                                    jnp.asarray(recycled)))
        # which slots the automaton filled from the recycle path: recompute
        # the pure-table prediction and compare
        p2, p1, s = prev2.copy(), last.copy(), since0.copy()
        from_rec = np.zeros((batch, k_blk - 1), bool)
        for j in range(k_blk - 1):
            tab = tri[p2, p1]
            tab = np.where(tab < 0, bi[p1], tab)
            tab = np.where(tab < 0, PAD_ID, tab)
            structural = (p1 == CAPTION_END_ID) | (s == 5) | \
                (p1 == EOS_ID) | (p1 == PAD_ID)
            from_rec[:, j] = (~structural) & (recycled[:, j] >= 0) & \
                (drafts[:, j] == recycled[:, j]) & (recycled[:, j] != tab)
            s = np.where(drafts[:, j] == CAPTION_END_ID, 0,
                         np.where(s >= 0, s + 1, s))
            p2, p1 = p1, drafts[:, j]

        block = np.concatenate([last[:, None], drafts], axis=1)
        logits, blk_kvs = blk(params, jnp.asarray(block), jnp.asarray(pos),
                              caches, mem_kvs)
        out = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)

        match = (out[:, :-1] == drafts) & (out[:, :-1] != EOS_ID)
        alive = np.cumprod(match.astype(np.int32), axis=1)
        acc = 1 + alive.sum(axis=1)
        acc = np.minimum(acc, steps - pos)
        acc = np.where(finished, 0, acc)

        caches = commit(caches, blk_kvs, jnp.asarray(pos), jnp.asarray(acc))

        rows = np.arange(batch)
        for b in rows[~finished]:
            acc_hist[int(acc[b])] += 1
            a = int(acc[b])
            if a < k_blk and a >= 1 and pos[b] + a < steps:
                j = a - 1  # first rejected draft slot
                src = ("recycle" if from_rec[b, j] else
                       ("structure" if (j == 0 and last[b] == CAPTION_END_ID)
                        or since0[b] + j == 5 else "table"))
                want, got = out[b, j], drafts[b, j]
                if got == want:   # rejected only because want == EOS
                    src = "eos-stop"
                miss_kind[src] += 1
                prevtok = block[b, j]
                miss_by_srctype[(src, name(want))] += 1
                miss_detail[(name(prevtok), name(want), name(got), src)] += 1

        # commit tokens/confs
        for b in rows:
            if finished[b] or acc[b] == 0:
                continue
            a = int(acc[b])
            tokens[b, pos[b] + 1: pos[b] + 1 + a] = out[b, :a]

        hit_eos = ((out == EOS_ID) &
                   (np.arange(k_blk)[None, :] < acc[:, None])).any(axis=1)
        new_pos = pos + acc
        commit_mask = np.arange(k_blk)[None, :] < acc[:, None]
        is_cls = (out >= LABEL_START) & (out <= LABEL_END) & commit_mask
        cap_seen = (out == CAPTION_END_ID) & commit_mask
        before_cap = np.cumsum(cap_seen.astype(np.int32), axis=1) == 0
        cls_in_blk = np.where(is_cls & before_cap & (since < 0)[:, None],
                              out, -1).max(axis=1)
        cls_tok = np.where(cls_in_blk >= 0, cls_in_blk, cls_tok)
        after = (np.cumsum(cap_seen.astype(np.int32), axis=1) > 0) \
            & commit_mask
        n_after = after.sum(axis=1) - cap_seen.any(axis=1).astype(np.int32)
        since = np.where(cap_seen.any(axis=1), n_after,
                         np.where(since >= 0, since + acc, since))
        last = tokens[rows, new_pos]
        prev2 = tokens[rows, np.maximum(new_pos - 1, 0)]
        finished = finished | hit_eos | (new_pos >= steps)
        pos = new_pos

        i_slot = np.arange(1, k_blk)[None, :]
        src = acc[:, None] - 1 + i_slot
        rec = np.take_along_axis(out, np.clip(src, 0, k_blk - 1), axis=1)
        avail = (src <= k_blk - 1) & ~finished[:, None] & (rec != PAD_ID)
        recycled = np.where(avail, rec, -1).astype(np.int32)
        if args.recycle == "shift":
            # mirror infer/speculative.py insertion-miss realignment
            from mdcnet_tpu.config import LABEL_START as _LS
            rejected = np.take_along_axis(
                block, np.clip(acc, 0, k_blk - 1)[:, None], axis=1)[:, 0]
            tab = tri[prev2, last]
            tab = np.where(tab < 0, bi[last], tab)
            insertion = ((acc < k_blk) & (tab == rejected)
                         & (rejected >= _LS) & ~finished)
            n_shift_fired[0] += int(insertion.sum())
            shifted = np.concatenate([rejected[:, None], recycled[:, :-1]],
                                     axis=1)
            recycled = np.where(insertion[:, None], shifted,
                                recycled).astype(np.int32)

    n_blocks = sum(acc_hist.values())
    n_tok = sum(a * c for a, c in acc_hist.items())
    print(f"iterations={it}  blocks(live-row)={n_blocks}  "
          f"tokens/block={n_tok / max(n_blocks, 1):.2f}")
    print(f"per-row blocks: mean={row_blocks.mean():.2f}  "
          f"p50={np.percentile(row_blocks, 50):.0f}  "
          f"p90={np.percentile(row_blocks, 90):.0f}  "
          f"max={row_blocks.max()}  shift_fired={n_shift_fired[0]}")
    print("acc histogram:", dict(sorted(acc_hist.items())))
    print("first-miss source:", dict(miss_kind))
    print("top miss situations (prev, wanted, drafted, src):")
    for key, cnt in miss_detail.most_common(15):
        print(f"  {cnt:5d}  {key}")


if __name__ == "__main__":
    main()
