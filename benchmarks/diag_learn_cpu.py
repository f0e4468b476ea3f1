"""Coordinate-learnability diagnostic (CPU, tiny geometry).

Round-3 quality plateau: on the learnable-synthetic task (pixels determine
label+box+caption, data/synthetic.py) the flagship converges captions but
leaves teacher-forced coordinate error at ~48 bins and GIoU pinned at ~1.33.
This script isolates the question "can THIS training stack learn coordinates
at all?" from scale: a tiny encoder-decoder must MEMORIZE 64 fixed rendered
examples' coordinates if (and only if) the pixel->box gradient path is sound.

Run: JAX_PLATFORMS=cpu python benchmarks/diag_learn_cpu.py [--steps 600]
Prints coordinate-position CE, argmax |err| in bins, and the GIoU metric
every 25 steps.  Interpretation:
  coord |err| -> ~0 bins  : stack is sound; flagship plateau is recipe/scale
  coord |err| stuck high  : bug in loss/data alignment or model wiring
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n", type=int, default=64, help="examples to memorize")
    ap.add_argument("--img", type=int, default=112)
    ap.add_argument("--diff-giou", action="store_true", default=True)
    ap.add_argument("--no-diff-giou", dest="diff_giou", action="store_false")
    ap.add_argument("--coord-sigma", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--augment", action="store_true",
                    help="train-time augmentation on (default off: pure "
                    "memorization)")
    args = ap.parse_args()

    from mdcnet_tpu import config as C
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.data.augment import preprocess
    from mdcnet_tpu.data.pipeline import SteelDefectDataset, collate
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary
    from mdcnet_tpu.train.state import create_train_state
    from mdcnet_tpu.train.step import make_train_step

    img = args.img
    cfg = C.Config(
        data=C.DataConfig(img_size=img, num_bins=img, batch_size=args.n,
                          max_len=40),
        model=C.ModelConfig(patch_size=16, img_size=img, enc_dim=128,
                            enc_depth=4, enc_heads=4, enc_out_dim=128,
                            dec_dim=128, dec_heads=4, dec_layers=2,
                            dec_ffn_dim=256, max_len=40,
                            num_patches=(img // 16) ** 2, dtype="float32",
                            dec_pos_dropout=0.05, dec_layer_dropout=0.0,
                            patch_dropout_rate=0.0),
        train=C.TrainConfig(replicate_nondiff_giou=not args.diff_giou,
                            coord_label_smooth_sigma=args.coord_sigma,
                            grad_clip_norm=1.0, lr=args.lr, max_lr=args.lr,
                            base_lr=args.lr),
    )

    records = ann.txt_file_to_records(
        "/root/reference/annotations_summary.txt", "/img")
    records = ann.take(records, np.arange(args.n))
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, cfg.data.num_bins, img, img,
                       max_len=cfg.data.max_len)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=tok.total_vocab_size))

    ds = SteelDefectDataset(records, tok, cfg.data,
                            synthetic_images="learnable", native_size=128)
    batch = collate([ds.example(i) for i in range(args.n)],
                    cfg.data.max_len, img)

    model = build_model(cfg.model)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, cfg, rng,
        jnp.zeros((args.n, img, img, 3)),
        jnp.zeros((args.n, cfg.data.max_len - 1), jnp.int32))
    train_step, eval_step = make_train_step(model, cfg)

    images = preprocess(jnp.asarray(batch.images), jax.random.PRNGKey(1),
                        img, train=args.augment)
    tokens = jnp.asarray(batch.tokens)

    # coordinate positions in y_expected: the 4 tokens after the label token.
    # The label slot is the first in-window token AFTER the first CAP_END —
    # the caption itself contains the class word under the same id
    # (data_processing.py:17-33).
    y_exp = np.asarray(tokens)[:, 1:]
    from mdcnet_tpu.config import CAPTION_END_ID, LABEL_END, LABEL_START
    pos_idx = np.arange(y_exp.shape[1])[None, :]
    cap_end = y_exp == CAPTION_END_ID
    eoc = np.where(cap_end.any(axis=1), cap_end.argmax(axis=1), -1)
    in_win = ((y_exp >= LABEL_START) & (y_exp <= LABEL_END)
              & (pos_idx > eoc[:, None]))
    label_pos = in_win.argmax(axis=1)
    coord_pos = label_pos[:, None] + 1 + np.arange(4)[None, :]  # (N,4)
    coord_gt = np.take_along_axis(y_exp, coord_pos, axis=1)     # (N,4) bins

    @jax.jit
    def coord_probe(params):
        logits = model.apply(params, images, tokens[:, 1:-1],
                             deterministic=True)
        lg = jnp.take_along_axis(
            logits, jnp.asarray(coord_pos)[..., None], axis=1)  # (N,4,V)
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(lg, -1),
            jnp.asarray(coord_gt)[..., None], -1)[..., 0]
        pred = jnp.argmax(lg[..., :cfg.data.num_bins], axis=-1)
        err = jnp.abs(pred - jnp.asarray(coord_gt))
        return ce.mean(), err.astype(jnp.float32).mean(), \
            (err <= 2).astype(jnp.float32).mean()

    t0 = time.time()
    for step in range(args.steps + 1):
        if step % 25 == 0:
            ce, err, near = coord_probe(state.params)
            print(f"step {step:4d}: coordCE={float(ce):.4f} "
                  f"|err|={float(err):.2f} bins frac<=2={float(near):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        state, metrics = train_step(state, images, tokens)
        if step % 25 == 0:
            print(f"           ce={float(metrics['ce_loss']):.4f} "
                  f"giou={float(metrics['giou_loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
