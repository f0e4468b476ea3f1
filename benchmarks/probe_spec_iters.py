"""Report verify-block iteration counts per draft-K on the trained workload.

Separates the two candidate causes of the speculative K-scaling problem
(bench_speculative: 1.11x/1.08x/0.87x at K=3/4/6):
  - per-iteration cost growth (decode_block getting slower with K), vs
  - raggedness (the lax.while_loop running to the slowest row's schedule).

Uses GenerateResult.n_iters (infer/speculative.py).  The ideal iteration
count for a row of length L at full acceptance is ceil(L / K); the gap to
the measured count is mismatch + raggedness.

Run: python benchmarks/probe_spec_iters.py [--ks 3,4,6,8]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ks", default="3,4,6,8")
    args = ap.parse_args()

    from bench import load_params
    from mdcnet_tpu.config import EOS_ID, large_preset
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.infer.speculative import (
        build_draft_tables, generate_speculative)
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    params, workload, _ = load_params(model, cfg)
    steps = cfg.infer.generation_steps
    print(f"workload={workload}", file=sys.stderr)

    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)
    ref = np.asarray(generate(model, params, images, jax.random.PRNGKey(2),
                              steps=steps, greedy=True,
                              early_exit=True).tokens)
    lengths = np.asarray([int(np.flatnonzero(r == EOS_ID)[0]) + 1
                          if (r == EOS_ID).any() else r.size for r in ref])
    print(f"lengths: mean={lengths.mean():.1f} max={lengths.max()}")

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
    tables = build_draft_tables(list(ref) + ann_seqs, cfg.model.vocab_size)

    for k in [int(x) for x in args.ks.split(",")]:
        res = generate_speculative(model, params, images, tables,
                                   steps=steps, draft_k=k)
        n = int(res.n_iters)
        ideal = int(np.ceil(lengths / k).max())
        # committed tokens / iterations = mean acceptance incl. raggedness
        print(f"K={k}: iters={n}  ideal(max-row)={ideal}  "
              f"mean_tok/iter={lengths.mean() / n:.2f}")


if __name__ == "__main__":
    main()
