"""Per-iteration cost of the REAL speculative loop body vs greedy.

probe_spec_inloop times a stripped verify body (block decode + commit +
token scatter) inside fori_loop: K=4 costs 1.15x a greedy step — flat.
The round-4 bench nevertheless shows ~13 ms per verify block end-to-end.
This probe times the ACTUAL generate/generate_speculative_from_memory
while_loops on UNTRAINED params (argmax is noise -> drafts never match,
EOS never fires, so both loops run the full deterministic budget) and
divides by the exact ``n_iters`` the loop reports, isolating the cost of
everything the stripped body omits: draft_tokens scan, conf softmax +
scatter, recycled-draft gather, cls/since bookkeeping, cond overhead.

Run: python benchmarks/probe_spec_realbody.py [--ks 3,4,6]
"""
from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--ks", default="3,4,6")
    args = ap.parse_args()

    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.infer.generate import generate_from_memory
    from mdcnet_tpu.infer.speculative import (
        build_draft_tables, generate_speculative_from_memory)
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)
    steps = cfg.infer.generation_steps
    batch = args.batch

    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
    tgt = jnp.zeros((1, cfg.data.max_len - 1), jnp.int32)
    params = jax.jit(model.init)({"params": rng}, images, tgt)

    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, 196, cfg.model.enc_out_dim), jnp.float32)

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

    def timed_iters(run, reps=3):
        toks = run()
        np.asarray(toks.tokens.ravel()[0])
        n = int(np.asarray(toks.n_iters)) if toks.n_iters is not None \
            else steps - 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run()
            np.asarray(out.tokens.ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, n

    # greedy full budget (early_exit on but EOS never fires untrained;
    # loop runs steps=98 iterations)
    ms, _ = timed_iters(lambda: generate_from_memory(
        model, params, enc, jax.random.PRNGKey(2), steps=steps,
        greedy=True, early_exit=True))
    n_g = min(steps, model.decoder.max_len - 2)
    print(f"greedy: {ms:7.1f} ms / {n_g} iters = {ms / n_g:6.2f} ms/iter",
          flush=True)

    for k in (int(s) for s in args.ks.split(",")):
        ms, n = timed_iters(lambda k=k: generate_speculative_from_memory(
            model, params, enc, tables, steps=steps, draft_k=k))
        print(f"spec K={k}: {ms:7.1f} ms / {n} iters = {ms / n:6.2f} "
              f"ms/iter", flush=True)


if __name__ == "__main__":
    main()
