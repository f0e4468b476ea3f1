"""Quality-plateau diagnostic on the learnable-synthetic task.

Loads the flagship checkpoint and measures, on validation batches:
  1. teacher-forced next-token accuracy split by target-token ROLE
     (coord / label / caption word / special) — is the model underfitting,
     and where?
  2. teacher-forced coordinate error in bins (|argmax - gt|) — near-miss
     (±1-2 bins, harmless at IoU 0.3) vs gross error;
  3. free-running generation vs GT for the same images — exposure bias
     shows up as TF-good/generation-bad.

Usage: python benchmarks/diag_quality.py [--checkpoint checkpoints_flagship]
       [--batches 4] [--batch 64]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def role_of(ids: np.ndarray) -> np.ndarray:
    """0=coord(0-257 bins window but really 0-223), 1=label, 2=word,
    3=special/pad."""
    out = np.full(ids.shape, 3, np.int32)
    out[(ids >= 0) & (ids <= 257)] = 0
    out[(ids >= 258) & (ids <= 267)] = 1
    out[ids >= 305] = 2
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints_flagship")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from mdcnet_tpu import config as C
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.data.augment import preprocess
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary, decode_jax
    from mdcnet_tpu.train.checkpoint import CheckpointManager

    cfg = C.large_preset()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                               batch_size=args.batch))
    records = ann.txt_file_to_records(
        "/root/reference/annotations_summary.txt", "/img")
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                       cfg.data.img_size, max_len=cfg.data.max_len)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=tok.total_vocab_size))
    _, valid_loader, _ = make_loaders(records, tok, cfg.data,
                                      synthetic_images="learnable")
    model = build_model(cfg.model)
    mgr = CheckpointManager(args.checkpoint, 1)
    params = mgr.restore_params(model, cfg)
    print(f"restored step {mgr.latest_step()}", flush=True)

    rng = jax.random.PRNGKey(0)

    @jax.jit
    def tf_logits(params, images, tokens):
        y_in = tokens[:, 1:-1]
        return model.apply(params, images, y_in)

    acc_by_role = {r: [0, 0] for r in range(4)}
    per_class: dict = {}
    coord_errs = []
    exact_tf = [0, 0]
    gen_rows = []
    for b, batch in enumerate(valid_loader):
        if b >= args.batches:
            break
        images = preprocess(jnp.asarray(batch.images), rng,
                            cfg.data.img_size, train=False)
        tokens = jnp.asarray(batch.tokens)
        logits = tf_logits(params, images, tokens)
        # position j of logits predicts tokens[:, j+1]
        pred = np.asarray(jnp.argmax(logits, -1))
        tgt = np.asarray(tokens)[:, 1:]
        L = min(pred.shape[1], tgt.shape[1])
        pred, tgt = pred[:, :L], tgt[:, :L]
        mask = tgt != C.PAD_ID
        roles = role_of(tgt)
        for r in range(4):
            m = mask & (roles == r)
            acc_by_role[r][0] += int((pred[m] == tgt[m]).sum())
            acc_by_role[r][1] += int(m.sum())
        cm = mask & (roles == 0)
        coord_errs.append(np.abs(pred[cm].astype(np.int64)
                                 - tgt[cm].astype(np.int64)))
        # per-class / per-box-size TF coordinate error: the tiny-defect
        # classes (inclusion/rolled_pit/oil_spot) sit at 0.07-0.12 AP —
        # is that visible already under teacher forcing?
        for i in range(tgt.shape[0]):
            lab_pos = np.flatnonzero(mask[i] & (roles[i] == 1))
            co_pos = np.flatnonzero(cm[i])
            if lab_pos.size == 0 or co_pos.size < 4:
                continue
            cls = int(tgt[i, lab_pos[0]])
            x0, y0, x1, y1 = tgt[i, co_pos[-4:]].astype(np.int64)
            area = max(x1 - x0, 0) * max(y1 - y0, 0)  # bins^2
            errs_i = np.abs(pred[i, co_pos].astype(np.int64)
                            - tgt[i, co_pos].astype(np.int64))
            per_class.setdefault(cls, []).append((area, errs_i))
        row_ok = ((pred == tgt) | ~mask).all(axis=1)
        exact_tf[0] += int(row_ok.sum())
        exact_tf[1] += len(row_ok)

        res = generate(model, params, images, rng, steps=101, greedy=True)
        gen = np.asarray(res.tokens)
        for i in range(gen.shape[0]):
            g = tok.decode(np.asarray(batch.tokens[i]))
            p = tok.decode(gen[i])
            gen_rows.append((g, p))

    names = {0: "coord", 1: "label", 2: "word", 3: "special"}
    for r in range(4):
        c, n = acc_by_role[r]
        print(f"TF acc[{names[r]}]: {c}/{n} = {c / max(n, 1):.4f}", flush=True)
    errs = np.concatenate(coord_errs)
    print(f"TF coord |err| bins: mean {errs.mean():.2f} "
          f"p50 {np.percentile(errs, 50):.0f} p90 {np.percentile(errs, 90):.0f} "
          f"frac<=2 {np.mean(errs <= 2):.3f} frac>10 {np.mean(errs > 10):.3f}",
          flush=True)
    print(f"TF row exact: {exact_tf[0]}/{exact_tf[1]}", flush=True)

    from mdcnet_tpu.config import LABEL_START
    cls_names = ["punching_hole", "welding_line", "crescent_gap",
                 "water_spot", "oil_spot", "silk_spot", "inclusion",
                 "rolled_pit", "crease", "waist_folding"]
    print("TF coord err by class (n, median box area bins^2, "
          "mean |err|, frac>10):", flush=True)
    for cls in sorted(per_class):
        rows = per_class[cls]
        areas = np.asarray([a for a, _ in rows])
        errs = np.concatenate([e for _, e in rows])
        nm = cls_names[cls - LABEL_START] if 0 <= cls - LABEL_START < 10 \
            else str(cls)
        print(f"  {nm:14s} n={len(rows):3d} area_p50={np.median(areas):7.0f} "
              f"mean|err|={errs.mean():6.2f} frac>10={np.mean(errs > 10):.3f}",
              flush=True)

    cap_match = np.mean([float(g[2] == p[2]) for g, p in gen_rows])
    lab_match = np.mean([float(g[0] == p[0]) for g, p in gen_rows])
    n_show = 6
    print(f"GEN caption exact {cap_match:.3f}  labels exact {lab_match:.3f}",
          flush=True)
    for g, p in gen_rows[:n_show]:
        print(f"  gt  labels={g[0]} boxes={g[1]} cap={g[2]!r}", flush=True)
        print(f"  gen labels={p[0]} boxes={p[1]} cap={p[2]!r}", flush=True)


if __name__ == "__main__":
    main()
