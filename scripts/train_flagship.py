"""Train the flagship model on the GC10 annotations.

Pixels: ``--pixels learnable`` (default) renders class+box-conditioned
defect images (data/synthetic.py) so captions, labels AND boxes are genuinely
learnable from pixels and the BASELINE quality gates (caption exact-match,
mAP@0.3, BLEU) can be measured end to end; ``--pixels noise`` reproduces the
round-1 structure-only workload; with ``--images DIR`` pointing at the real
GC10 folder the same script trains on real pixels.

Produces a checkpoint under --out (bench.py picks up checkpoints_flagship/
for the trained-workload headline) and prints the quality gates measured on
the validation split via the full generation path.

Usage:
  python scripts/train_flagship.py --epochs 3 --batch 64 \
      --out checkpoints_flagship [--preset large] [--pixels learnable]
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
    ap.add_argument("--images", default="",
                    help="real image folder (turns synthetic pixels off)")
    ap.add_argument("--pixels", default="learnable",
                    choices=["learnable", "noise"],
                    help="synthetic pixel mode when no --images")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="checkpoints_run",
                    help="live training output dir (GC'd by max_to_keep=1 "
                    "on every run — keep it OUTSIDE the git-pinned bench "
                    "dir; retrain_flagship.sh copies the final full-state "
                    "checkpoint into checkpoints_flagship/)")
    ap.add_argument("--preset", default="large")
    ap.add_argument("--pretrained", default="",
                    help="converted ImageNet encoder .npz")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in --out")
    ap.add_argument("--resume-params", action="store_true",
                    help="restore params only (fresh optimizer) — needed "
                    "when the optimizer tree changes, e.g. turning on "
                    "--grad-clip against an unclipped checkpoint; also "
                    "seconds instead of minutes over the device tunnel")
    ap.add_argument("--resume-geom", type=int, default=0,
                    help="image size the source checkpoint was trained at "
                    "(with --resume-params and a different --img-size: the "
                    "two patch-grid positional embeddings are bilinearly "
                    "re-gridded — e.g. fine-tune the 224 flagship at 448 "
                    "for small-defect localization)")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off)")
    ap.add_argument("--coord-sigma", type=float, default=0.0,
                    help="Gaussian label smoothing over coordinate bins "
                    "(sigma in bins; 0 = one-hot CE)")
    ap.add_argument("--skip-quality", action="store_true",
                    help="skip the post-training quality measurement")
    ap.add_argument("--save-every", type=int, default=5,
                    help="intermediate-checkpoint cadence in epochs; "
                    "intermediate saves are params-only (~3x less tunnel "
                    "traffic than the full TrainState) and exist so an "
                    "interrupted run still leaves bench.py a usable "
                    "checkpoint; the final save is always the full state")
    ap.add_argument("--max-lr", type=float, default=0.0,
                    help="override the cyclic LR ceiling (0 = preset)")
    ap.add_argument("--pos-dropout", type=float, default=-1.0,
                    help="override decoder pos dropout (reference: 0.4)")
    ap.add_argument("--layer-dropout", type=float, default=-1.0)
    ap.add_argument("--patch-dropout", type=float, default=-1.0)
    ap.add_argument("--diff-giou", action="store_true",
                    help="differentiable expected-coordinate GIoU (the "
                    "reference's sampled-token GIoU carries no gradient; "
                    "round-3 diag: TF coord acc 0.21 vs label acc 0.94 "
                    "because boxes only ever learned through CE)")
    ap.add_argument("--zoom-crop", type=float, default=0.5,
                    help="train-time zoom-crop augmentation probability "
                         "(small-defect localization; caption position "
                         "words recomputed in crop space — pipeline.py)")
    ap.add_argument("--img-size", type=int, default=0,
                    help="hi-res quality config: train at NxN pixels "
                    "(multiple of 16; 0 = preset 224).  num_bins stays 224 "
                    "so the coordinate vocabulary and all decode windows "
                    "are unchanged; only the encoder sees more pixels.  "
                    "Targets the sub-patch-size defect classes whose "
                    "per-class AP is 0.07-0.12 at 224 (docs/PERF.md)")
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
                                               batch_size=args.batch,
                                               zoom_crop_prob=args.zoom_crop))
    if args.img_size:
        assert args.img_size % cfg.model.patch_size == 0, \
            "--img-size must be a multiple of the 16px patch"
        n_patch = (args.img_size // cfg.model.patch_size) ** 2
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, img_size=args.img_size),
            model=dataclasses.replace(cfg.model, img_size=args.img_size,
                                      num_patches=n_patch))
    if args.max_lr:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    max_lr=args.max_lr))
    if args.diff_giou:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, replicate_nondiff_giou=False))
    if args.grad_clip:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, grad_clip_norm=args.grad_clip))
    if args.coord_sigma:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, coord_label_smooth_sigma=args.coord_sigma))
    # dropout overrides: the post-norm stack trained at the reference's 0.4
    # elementwise dropout sees ~1.3x larger activation variance than at
    # eval; on the synthetic task the model co-adapts and deterministic
    # inference collapses (docs/PERF.md round-2 notes) — the convergence
    # run recalibrates with low dropout
    mo = {}
    if args.pos_dropout >= 0:
        mo["dec_pos_dropout"] = args.pos_dropout
    if args.layer_dropout >= 0:
        mo["dec_layer_dropout"] = args.layer_dropout
    if args.patch_dropout >= 0:
        mo["patch_dropout_rate"] = args.patch_dropout
    if mo:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **mo))
    if args.pretrained:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, pretrained_path=args.pretrained))

    records = ann.txt_file_to_records(args.annotations, args.images or "/img")
    synthetic = False if args.images else (
        "learnable" if args.pixels == "learnable" else True)
    if args.images:
        records = ann.filter_existing_images(records)
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                       cfg.data.img_size, max_len=cfg.data.max_len)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=tok.total_vocab_size))

    train_loader, valid_loader, _ = make_loaders(records, tok, cfg.data,
                                                 synthetic_images=synthetic)
    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = create_train_state(
        model, cfg, rng,
        jnp.zeros((args.batch, cfg.data.img_size, cfg.data.img_size, 3)),
        jnp.zeros((args.batch, cfg.data.max_len - 1), jnp.int32))

    logger = MetricLogger()
    ckpt = CheckpointManager(args.out, max_to_keep=1)
    # params-only resume restarts state.step at 0; keep SAVED step numbers
    # monotonic past the source checkpoint or orbax's max_to_keep GC keeps
    # the old higher-numbered step and silently deletes every new save
    # (lost a 112-epoch run to this)
    step_base = 0
    if args.resume_params and ckpt.latest_step() is not None:
        step_base = ckpt.latest_step()
        if args.resume_geom and args.resume_geom != cfg.data.img_size:
            # restore at the source geometry, then re-grid the patch-seq
            # positional embeddings to the current one
            from mdcnet_tpu.models.encdec import adapt_params_resolution
            src_n = (args.resume_geom // cfg.model.patch_size) ** 2
            src_cfg = cfg.replace(
                data=dataclasses.replace(cfg.data,
                                         img_size=args.resume_geom),
                model=dataclasses.replace(cfg.model,
                                          img_size=args.resume_geom,
                                          num_patches=src_n))
            src_model = build_model(src_cfg.model)
            params = ckpt.restore_params(src_model, src_cfg)
            params = adapt_params_resolution(params, cfg.model.num_patches)
            print(f"re-gridded pos embeds {src_n} -> "
                  f"{cfg.model.num_patches} patches", flush=True)
        else:
            params = ckpt.restore_params(model, cfg)
        state = state.replace(params=jax.device_put(params))
        print(f"resumed params from step {step_base}", flush=True)
    elif args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}", flush=True)
    trainer = Trainer(model, cfg, logger=logger, checkpoints=None)

    for epoch in range(args.epochs):
        t0 = time.time()
        state, metrics = trainer.train_epoch(state, train_loader)
        print(f"epoch {epoch}: ce={metrics['ce_loss']:.4f} "
              f"giou={metrics['giou_loss']:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        # a full-state save round-trips ~1.5 GB through the device tunnel
        # (~90 s); intermediate saves are params-only (~30 s) and exist so
        # an interrupted run still leaves a bench-usable checkpoint
        if epoch == args.epochs - 1:
            ckpt.save(state, step=step_base + int(state.step))
        elif (args.save_every > 0
              and epoch % args.save_every == args.save_every - 1):
            # --save-every 0: final full-state save only
            ckpt.save_params(state.params, step=step_base + int(state.step))
    print(f"saved step={step_base + int(state.step)} -> {args.out}",
          flush=True)

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

    if not args.skip_quality:
        # BASELINE quality gates on the validation split via full generation
        from mdcnet_tpu.train.test_epoch import test_epoch
        quality = test_epoch(model, state.params, valid_loader, tok, cfg)
        import json
        print("QUALITY " + json.dumps(
            {k: round(float(v), 4) for k, v in quality.items()}), flush=True)


if __name__ == "__main__":
    main()
