"""End-to-end A/B of the encoder/prefill serving knobs on the trained
checkpoint: exact baseline vs tanh-GELU vs +bf16 attention scores vs
+folded cross-K/V prefill (and the full combo), all through
``generate(greedy=True, early_exit=True, compact_to=...)`` at B=256.

Each row reports ms/batch, img/s, token agreement vs the exact baseline —
the serving-default decision is a measurement, not a guess (VERDICT r03).

Run (chip free): python benchmarks/probe_serving_knobs.py [--batch 256]
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
    ap.add_argument("--compact", type=int, default=0)
    args = ap.parse_args()

    from bench import load_params
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model

    base_cfg = large_preset()
    base_cfg = base_cfg.replace(model=dataclasses.replace(
        base_cfg.model, vocab_size=332))
    model_exact = build_model(base_cfg.model)
    params, workload, _ = load_params(model_exact, base_cfg)
    print(f"workload={workload}", file=sys.stderr)

    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch, base_cfg.data.img_size, base_cfg.data.img_size, 3),
        jnp.float32)

    variants = [
        ("exact", {}, False),
        ("tanh", {"enc_gelu_approx": True}, False),
        ("tanh_bf16attn", {"enc_gelu_approx": True,
                           "enc_attn_impl": "bf16"}, False),
        ("tanh_fold", {"enc_gelu_approx": True}, True),
        ("tanh_bf16attn_fold", {"enc_gelu_approx": True,
                                "enc_attn_impl": "bf16"}, True),
        ("tanh_bf16attn_fold_int8", {"enc_gelu_approx": True,
                                     "enc_attn_impl": "bf16",
                                     "enc_int8": True}, True),
        ("int8_only", {"enc_int8": True}, False),
        ("tanh_bf16attn_fold_int8static", {"enc_gelu_approx": True,
                                           "enc_attn_impl": "bf16",
                                           "enc_int8_static": True}, True),
        ("int8static_only", {"enc_int8_static": True}, False),
    ]

    # static-int8 calibration (one pass, reused by every *int8static* rung)
    from mdcnet_tpu.ops.int8 import calibrate_encoder
    calib = calibrate_encoder(base_cfg.model, params, [images[:64]])
    params_calib = {**params, "calib": calib}

    out = {"workload": workload, "batch": args.batch,
           "compact_to": args.compact}
    ref_tokens = None
    for name, over, fold in variants:
        model = (model_exact if not over
                 else build_model(dataclasses.replace(base_cfg.model, **over)))
        run_params = params_calib if "int8static" in name else params

        def run(key, model=model, fold=fold, run_params=run_params):
            return generate(model, run_params, images, key, steps=101,
                            greedy=True, early_exit=True,
                            compact_to=args.compact,
                            fold_prefill=fold).tokens

        toks = np.asarray(run(jax.random.PRNGKey(2)))  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            tok = run(jax.random.PRNGKey(3 + i))
        np.asarray(tok)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        row = {"ms": round(ms, 1), "img_s": round(args.batch / ms * 1e3, 1)}
        if ref_tokens is None:
            ref_tokens = toks
        else:
            row["token_agree"] = round(float((toks == ref_tokens).mean()), 6)
            row["rows_identical"] = round(
                float((toks == ref_tokens).all(axis=1).mean()), 4)
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)

    print("SERVING_KNOBS " + json.dumps(out))


if __name__ == "__main__":
    main()
