"""Megakernel vs XLA decode on the flagship geometry (real TPU).

Measures both generation paths end-to-end (encoder excluded — decode only,
from a precomputed encoder output) and checks caption-token agreement.

Usage: python benchmarks/bench_megakernel.py [--batch 256] [--steps 101]
       [--checkpoint checkpoints_flagship] [--early-exit]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=101)
    ap.add_argument("--checkpoint", default="checkpoints_flagship")
    ap.add_argument("--early-exit", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.generate import (generate_from_memory,
                                            generate_megakernel)
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.train.checkpoint import CheckpointManager

    cfg = large_preset()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, vocab_size=332))
    model = build_model(cfg.model)

    workload = "untrained"
    params = None
    try:
        mgr = CheckpointManager(args.checkpoint, 1)
        if mgr.latest_step() is not None:
            params = jax.device_put(mgr.restore_params(model, cfg))
            workload = "trained"
    except Exception as e:
        print(f"no checkpoint ({e!r})", file=sys.stderr)
    if params is None:
        rng = jax.random.PRNGKey(1)
        params = model.init(
            {"params": rng},
            jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3)),
            jnp.zeros((1, cfg.data.max_len - 1), jnp.int32))

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(
        rng, (args.batch, cfg.data.img_size, cfg.data.img_size, 3))
    encoder_out = jax.jit(
        lambda p, im: model.apply(p, im, method="encode"))(params, images)
    fence(encoder_out)
    print(f"workload={workload} encoder_out={encoder_out.shape}", flush=True)

    results = {}
    for name, mk in (("xla", False), ("megakernel", True)):
        def run(key, mk=mk):
            fn = generate_megakernel if mk else generate_from_memory
            return fn(model, params, encoder_out, key, steps=args.steps,
                      greedy=True, early_exit=args.early_exit).tokens
        t0 = time.perf_counter()
        tokens = run(jax.random.PRNGKey(2))
        fence(tokens)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.iters - 1):
            tokens = run(jax.random.PRNGKey(3))
        fence(run(jax.random.PRNGKey(3)))
        dt = (time.perf_counter() - t0) / args.iters
        ips = args.batch / dt
        results[name] = (np.asarray(tokens), dt, ips)
        print(f"{name}: {dt*1e3:.1f} ms/batch = {ips:.0f} img/s "
              f"(compile {compile_s:.0f}s)", flush=True)

    tx, tm = results["xla"][0], results["megakernel"][0]
    agree = float(np.mean(tx == tm))
    rows_equal = float(np.mean((tx == tm).all(axis=1)))
    print(f"token agreement: {agree:.4f} (rows fully equal: "
          f"{rows_equal:.4f})", flush=True)
    print(f"speedup: {results['xla'][1] / results['megakernel'][1]:.2f}x",
          flush=True)
    # machine-checkable summary line (archived by the round driver)
    import json
    print("MEGAKERNEL_AGREEMENT " + json.dumps({
        "token_agreement": round(agree, 6),
        "rows_equal": round(rows_equal, 6),
        "xla_ms": round(results["xla"][1] * 1e3, 2),
        "megakernel_ms": round(results["megakernel"][1] * 1e3, 2),
        "speedup": round(results["xla"][1] / results["megakernel"][1], 4),
        "batch": args.batch, "steps": args.steps,
        "early_exit": bool(args.early_exit), "workload": workload,
    }), flush=True)


if __name__ == "__main__":
    main()
