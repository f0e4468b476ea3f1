"""Train the flagship model on the GC10 annotations (synthetic pixels).

Purpose: produce a checkpoint whose decoder has learned the caption/sequence
structure (template words, CAP_END, label window, EOS at the right offset) so
generation-time EOS early-exit reflects the real serving workload.  Box
regression cannot be learned from synthetic pixels — caption structure and
sequence lengths can (they are what gate generation length).

Usage:
  python scripts/train_flagship.py --epochs 3 --batch 64 \
      --out checkpoints_flagship [--preset large]
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
    ap.add_argument("--annotations",
                    default="/root/reference/annotations_summary.txt")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="checkpoints_flagship")
    ap.add_argument("--preset", default="large")
    args = ap.parse_args()

    from mdcnet_tpu import config as C
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary
    from mdcnet_tpu.train.checkpoint import CheckpointManager
    from mdcnet_tpu.train.loop import Trainer
    from mdcnet_tpu.train.state import create_train_state
    from mdcnet_tpu.utils.logging import MetricLogger

    cfg = {"large": C.large_preset, "tiny": C.tiny_preset,
           "test": C.test_preset}[args.preset]()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                               batch_size=args.batch))

    records = ann.txt_file_to_records(args.annotations, "/img")
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                       cfg.data.img_size, max_len=cfg.data.max_len)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=tok.total_vocab_size))

    train_loader, valid_loader, _ = make_loaders(records, tok, cfg.data,
                                                 synthetic_images=True)
    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = create_train_state(
        model, cfg, rng,
        jnp.zeros((args.batch, cfg.data.img_size, cfg.data.img_size, 3)),
        jnp.zeros((args.batch, cfg.data.max_len - 1), jnp.int32))

    logger = MetricLogger()
    ckpt = CheckpointManager(args.out, max_to_keep=1)
    trainer = Trainer(model, cfg, logger=logger, checkpoints=None)

    for epoch in range(args.epochs):
        t0 = time.time()
        metrics = trainer.train_epoch(state, train_loader)
        state = trainer.state
        print(f"epoch {epoch}: ce={metrics['ce_loss']:.4f} "
              f"giou={metrics['giou_loss']:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    ckpt.save(state)
    print(f"saved step={int(state.step)} -> {args.out}", flush=True)

    # quick workload probe: generation length with early exit
    from mdcnet_tpu.config import EOS_ID
    from mdcnet_tpu.infer.generate import generate
    images = jax.random.uniform(rng, (32, cfg.data.img_size,
                                      cfg.data.img_size, 3))
    out = generate(model, state.params, images, rng, steps=101, greedy=True)
    tokens = np.asarray(out.tokens)
    lengths = [int(np.flatnonzero(r == EOS_ID)[0]) + 1
               if (r == EOS_ID).any() else len(r) for r in tokens]
    print("generated length stats:", {"mean": float(np.mean(lengths)),
                                      "min": min(lengths),
                                      "max": max(lengths)}, flush=True)
    sample = tokens[0]
    print("sample row:", sample[:30].tolist(), flush=True)


if __name__ == "__main__":
    main()
