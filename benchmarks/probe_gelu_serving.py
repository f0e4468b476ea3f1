"""Is tanh-GELU a safe serving default?  Token agreement + end-to-end A/B.

The encoder's exact-erf GELU costs ~9 ms/batch over the tanh approximation
at B=256 (bench_encoder.py: 66.7 vs 57.4 ms).  The approximation changes
activations by ~1e-3 relative, which can flip greedy argmax ties — this
probe measures, on the TRAINED checkpoint, (a) generated-token agreement
between exact and tanh encoders and (b) the end-to-end generation A/B, so
the serving-default decision is a measurement.

Run (chip must be free): python benchmarks/probe_gelu_serving.py
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


def main():
    from bench import load_params
    from mdcnet_tpu.config import EOS_ID, large_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model

    batch = int(os.environ.get("MDCNET_BENCH_BATCH", "256"))
    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model_exact = build_model(cfg.model)
    model_tanh = build_model(dataclasses.replace(cfg.model,
                                                 enc_gelu_approx=True))
    params, workload, _ = load_params(model_exact, cfg)
    print(f"workload={workload}", file=sys.stderr)

    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (batch, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)

    def run(model, key):
        return generate(model, params, images, key, steps=101,
                        greedy=True, early_exit=True).tokens

    out = {}
    toks = {}
    for name, model in (("exact", model_exact), ("tanh", model_tanh)):
        t = np.asarray(run(model, jax.random.PRNGKey(2)))  # compile+warm
        toks[name] = t
        t0 = time.perf_counter()
        for i in range(5):
            tok = run(model, jax.random.PRNGKey(3 + i))
        np.asarray(tok)
        ms = (time.perf_counter() - t0) / 5 * 1e3
        out[name] = {"ms": round(ms, 1),
                     "img_s": round(batch / ms * 1e3, 1)}
        print(f"{name}: {ms:.1f} ms", file=sys.stderr)

    agree = float((toks["exact"] == toks["tanh"]).mean())
    rows = float((toks["exact"] == toks["tanh"]).all(axis=1).mean())
    out["token_agreement"] = round(agree, 6)
    out["rows_identical"] = round(rows, 4)
    out["speedup"] = round(out["exact"]["ms"] / out["tanh"]["ms"], 3)
    print("GELU_SERVING " + json.dumps(out))


if __name__ == "__main__":
    main()
