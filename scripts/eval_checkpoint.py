"""Run the BASELINE quality gates on a saved checkpoint.

Restores params from a checkpoint directory (full-state or params-only)
and runs the full generation-based test battery (train/test_epoch.py —
the reference's test_epoch semantics, train_val_epoch.py:727-887) on the
validation split: mAP@0.3 with per-class AP, mean max-IoU, GIoU loss,
caption BLEU, exact-match gated/ungated.

Usage:
    python scripts/eval_checkpoint.py --ckpt checkpoints_zoom
    python scripts/eval_checkpoint.py --ckpt checkpoints_flagship
The data/tokenizer build mirrors scripts/train_flagship.py exactly so
numbers are comparable across checkpoints trained by that script.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint directory (orbax step subdirs)")
    ap.add_argument("--annotations",
                    default="/root/reference/annotations_summary.txt")
    ap.add_argument("--images", default="",
                    help="real image dir; default learnable synthetic")
    ap.add_argument("--preset", default="large")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--split", default="valid", choices=("valid", "test"),
                    help="which split of the sklearn-exact 3-way split")
    ap.add_argument("--img-size", type=int, default=0,
                    help="evaluate at NxN pixels (must match training)")
    args = ap.parse_args()

    from mdcnet_tpu import config as C
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary
    from mdcnet_tpu.train.checkpoint import CheckpointManager
    from mdcnet_tpu.train.test_epoch import test_epoch

    cfg = {"large": C.large_preset, "tiny": C.tiny_preset,
           "test": C.test_preset}[args.preset]()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                               batch_size=args.batch))
    if args.img_size:
        n_patch = (args.img_size // cfg.model.patch_size) ** 2
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, img_size=args.img_size),
            model=dataclasses.replace(cfg.model, img_size=args.img_size,
                                      num_patches=n_patch))

    records = ann.txt_file_to_records(args.annotations, args.images or "/img")
    synthetic = False if args.images else "learnable"
    if args.images:
        records = ann.filter_existing_images(records)
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                       cfg.data.img_size, max_len=cfg.data.max_len)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=tok.total_vocab_size))

    _, valid_loader, test_loader = make_loaders(records, tok, cfg.data,
                                                synthetic_images=synthetic)
    loader = valid_loader if args.split == "valid" else test_loader

    model = build_model(cfg.model)
    mgr = CheckpointManager(args.ckpt, max_to_keep=1)
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint in {args.ckpt}"
    params = jax.device_put(mgr.restore_params(model, cfg))
    print(f"restored {args.ckpt}/{step}", flush=True)

    quality = test_epoch(model, params, loader, tok, cfg)
    print("QUALITY " + json.dumps(
        {"ckpt": f"{args.ckpt}/{step}", "split": args.split,
         **{k: round(float(v), 4) for k, v in quality.items()}}), flush=True)


if __name__ == "__main__":
    main()
