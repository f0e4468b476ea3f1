"""Why does the speculative loop only commit ~1.8 tokens/block at K=4?

probe_spec_iters (trained workload): n_iters=12 vs ideal 6 at K=4 —
mean 1.83 committed tokens per verify block, far below what template
captions should draft.  This probe separates DRAFT TABLE quality from
LOOP mechanics:

1. greedy-generate the workload batch on device (the ground truth each
   block's verify argmax reproduces given a correct prefix);
2. host-side, replay the drafter automaton (trigram/bigram + copy/EOS
   structure rules + recycling) against each greedy sequence with an
   ORACLE verifier (the model always predicts the true next token —
   optimistic for recycled slots conditioned on a wrong draft);
3. report simulated blocks/row and tokens/block vs the measured loop,
   plus the top miss contexts (prev2, prev1 -> wanted vs drafted).

If simulated tokens/block ~= measured, the tables are the bottleneck;
if simulated >> measured, the loop mechanics drop drafts they should
accept (bug hunt in infer/speculative.py).

Run: python benchmarks/probe_draft_quality.py [--k 4]
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
    ap.add_argument("--recycle", default="oracle",
                    choices=("oracle", "off"))
    args = ap.parse_args()

    from bench import load_params
    from mdcnet_tpu.config import (CAPTION_END_ID, EOS_ID, LABEL_END,
                                   LABEL_START, PAD_ID, large_preset)
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.infer.speculative import build_draft_tables
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    params, workload, _ = load_params(model, cfg)
    print(f"workload={workload}", file=sys.stderr)

    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)
    ref = np.asarray(generate(model, params, images, jax.random.PRNGKey(2),
                              steps=cfg.infer.generation_steps, greedy=True,
                              early_exit=True).tokens)

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

    k = args.k
    miss_ctx = collections.Counter()
    slot_hits = np.zeros(k - 1)
    slot_total = np.zeros(k - 1)
    total_blocks = 0
    total_tokens = 0
    itos = {i: w for w, i in vocab.stoi.items()} if hasattr(vocab, "stoi") \
        else {}

    def name(t):
        return itos.get(int(t), str(int(t)))

    for row in ref:
        eos = np.flatnonzero(row == EOS_ID)
        end = int(eos[0]) if eos.size else len(row) - 1
        seq = row[: end + 1]          # seq[0]=BOS ... seq[end]=EOS
        # simulate: pos = number of committed tokens beyond BOS
        pos = 0
        cls_tok = -1
        since = -1
        recycled = None               # None or list of k-1 oracle tokens
        blocks = 0
        while pos < end and blocks < 200:
            # build k-1 drafts from the automaton
            prev = seq[pos]
            prev2 = seq[pos - 1] if pos >= 1 else PAD_ID
            s = since if prev != CAPTION_END_ID else 0
            drafts = []
            p2, p1 = int(prev2), int(prev)
            for j in range(k - 1):
                nxt = tri[p2, p1]
                if nxt < 0:
                    nxt = bi[p1]
                if nxt < 0:
                    nxt = PAD_ID
                if recycled is not None and recycled[j] >= 0:
                    nxt = recycled[j]
                if p1 == CAPTION_END_ID and cls_tok >= 0:
                    nxt = cls_tok
                if s == 5:
                    nxt = EOS_ID
                if p1 in (EOS_ID, PAD_ID):
                    nxt = PAD_ID
                if nxt == CAPTION_END_ID:
                    s = 0
                elif s >= 0:
                    s += 1
                drafts.append(int(nxt))
                p2, p1 = p1, int(nxt)
            # oracle verify: true next tokens are seq[pos+1 ...]
            acc = 1
            for j in range(k - 1):
                want = seq[pos + 1 + j] if pos + 1 + j <= end else PAD_ID
                slot_total[j] += 1
                if drafts[j] == want and want != EOS_ID:
                    slot_hits[j] += 1
                    acc += 1
                else:
                    if drafts[j] != want:
                        c2 = seq[pos + j] if pos + j >= 0 else PAD_ID
                        c1 = seq[pos + j - 1] if pos + j - 1 >= 0 else PAD_ID
                        miss_ctx[(name(c1), name(c2), name(want),
                                  name(drafts[j]))] += 1
                    break
            acc = min(acc, end - pos)
            # bookkeeping on committed tokens
            for t in seq[pos + 1: pos + 1 + acc]:
                t = int(t)
                if LABEL_START <= t <= LABEL_END and since < 0:
                    cls_tok = t
                if t == CAPTION_END_ID:
                    since = 0
                elif since >= 0:
                    since += 1
            pos += acc
            blocks += 1
            if args.recycle == "oracle":
                # model's own beyond-commit predictions: oracle says they
                # equal the true sequence (optimistic)
                recycled = [int(seq[pos + 1 + j]) if pos + 1 + j <= end
                            else -1 for j in range(k - 1)]
            else:
                recycled = None
        total_blocks += blocks
        total_tokens += end

    n = len(ref)
    print(f"simulated (recycle={args.recycle}): "
          f"blocks/row={total_blocks / n:.2f}  "
          f"tokens/block={total_tokens / total_blocks:.2f}")
    print("draft slot hit rates:",
          [f"{h / max(t, 1):.3f}" for h, t in zip(slot_hits, slot_total)])
    print("top miss contexts (prev2, prev1 -> wanted, drafted):")
    for (c1, c2, want, got), cnt in miss_ctx.most_common(12):
        print(f"  {cnt:5d}  ({c1}, {c2}) -> wanted {want}, drafted {got}")


if __name__ == "__main__":
    main()
