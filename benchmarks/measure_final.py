"""End-of-round measurement battery (real TPU, run after training frees it).

1. quality gates on the valid split (generation path: exact-match, mAP,
   BLEU) + generated-length stats
2. encoder forward timing, exact vs tanh GELU
Prints one labelled line per result.  bench.py / bench_megakernel.py run
separately (own processes).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    from mdcnet_tpu import config as C
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary
    from mdcnet_tpu.train.checkpoint import CheckpointManager
    from mdcnet_tpu.train.test_epoch import test_epoch
    from mdcnet_tpu.data.augment import preprocess

    cfg = C.large_preset()
    records = ann.txt_file_to_records(
        "/root/reference/annotations_summary.txt", "/img")
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, cfg.data.num_bins, cfg.data.img_size,
                      cfg.data.img_size, max_len=cfg.data.max_len)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model,
                                  vocab_size=tok.total_vocab_size),
        data=dataclasses.replace(cfg.data, batch_size=64))
    _, valid_loader, _ = make_loaders(records, tok, cfg.data,
                                      synthetic_images="learnable")
    model = build_model(cfg.model)
    mgr = CheckpointManager(os.environ.get("MDCNET_MEASURE_CKPT",
                                           "checkpoints_flagship"), 1)
    params = jax.device_put(mgr.restore_params(model, cfg))
    print(f"checkpoint step={mgr.latest_step()}", flush=True)

    # generated length stats (early-exit behavior)
    rng = jax.random.PRNGKey(0)
    for batch in valid_loader:
        images = preprocess(jnp.asarray(batch.images), rng,
                            cfg.data.img_size, train=False)
        res = generate(model, params, images, rng, steps=101, greedy=True)
        t = np.asarray(res.tokens)
        eos = (t == C.EOS_ID)
        lengths = np.where(eos.any(1), eos.argmax(1), t.shape[1])
        print("LENGTHS " + json.dumps({
            "mean": float(lengths.mean()), "min": int(lengths.min()),
            "max": int(lengths.max())}), flush=True)
        break

    quality = test_epoch(model, params, valid_loader, tok, cfg)
    print("QUALITY " + json.dumps(
        {k: round(float(v), 4) for k, v in quality.items()}), flush=True)

    # encoder gelu A/B
    images = jax.random.uniform(jax.random.PRNGKey(1), (256, 224, 224, 3))
    for approx in (False, True):
        cfg2 = cfg.replace(model=dataclasses.replace(
            cfg.model, enc_gelu_approx=approx))
        m2 = build_model(cfg2.model)
        enc = jax.jit(lambda p, im, m=m2: m.apply(p, im, method="encode"))
        fence(enc(params, images))
        t0 = time.perf_counter()
        for _ in range(4):
            out = enc(params, images)
        fence(out)
        dt = (time.perf_counter() - t0) / 4
        print(f"ENCODE gelu_approx={approx}: {dt*1e3:.1f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
