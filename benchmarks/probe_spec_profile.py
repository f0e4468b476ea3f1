"""Profile the speculative-decode while_loop body on the real chip.

Captures a jax.profiler trace of ``generate_speculative_from_memory`` (the
decode loop only — encoder_out precomputed) and aggregates per-op device
durations from the XSpace, to find where the verify-step time goes as K
grows (bench_speculative measures 9.0 / 12.8 / 26.6 ms per iteration at
K=3/4/6 — superlinear in K, cause unknown).

Run: python benchmarks/probe_spec_profile.py [--k 4] [--batch 256]
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from bench import load_params
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.infer.speculative import (
        build_draft_tables, generate_speculative_from_memory)
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
    encoder_out = jax.jit(
        lambda p, im: model.apply(p, im, method="encode"))(params, images)
    np.asarray(encoder_out[0, 0, :1])

    ref = np.asarray(generate(model, params, images, jax.random.PRNGKey(2),
                              steps=steps, greedy=True,
                              early_exit=True).tokens)
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

    def run():
        return generate_speculative_from_memory(
            model, params, encoder_out, tables, steps=steps,
            draft_k=args.k).tokens

    np.asarray(run())  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run())
    print(f"decode-only ms (1 run): {(time.perf_counter()-t0)*1e3:.1f}",
          file=sys.stderr)

    logdir = tempfile.mkdtemp(prefix=f"spec_prof_k{args.k}_")
    jax.profiler.start_trace(logdir)
    np.asarray(run())
    jax.profiler.stop_trace()

    # aggregate device-side op durations from the xspace
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane captured", logdir)
        return
    pd = jax.profiler.ProfileData.from_file(paths[0])
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                per_op[name] += dur
                total += dur
    print(f"plane total (sum of op events, all lines): {total:.1f} ms")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms:8.2f} ms  {name}")


if __name__ == "__main__":
    main()
