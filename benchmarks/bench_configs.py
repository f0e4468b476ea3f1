"""The five BASELINE.json benchmark configs.

Run: ``python benchmarks/bench_configs.py [--configs 1,2,3] [--quick]``

  1. single-image greedy caption latency (p50), flagship geometry
  2. batch-32 captioning at 224² with KV-cached beam search (beam=3)
  3. axial-attention encoder variant at 224², batch-64
  4. caption + bbox grounding eval: generation fused with the IoU/mAP
     decode pipeline
  5. 512² streaming eval: context-parallel encoder (runs multi-chip when a
     context axis exists; single-chip otherwise) + cached generation

Each config prints one JSON line.  ``bench.py`` at the repo root remains the
driver's headline metric (throughput, config-2-like at batch 256).

All timings fence with a device->host readback (block_until_ready does not
synchronize over the axon tunnel).
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


def timed(fn, iters=5):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50)), float(np.mean(times))


TRAINED = False  # set by --trained: flagship-geometry configs load the
# checkpoints_flagship weights and run the trained early-exit workload


def init_params(model, img_size, flagship=False):
    """Untrained init; with --trained and flagship geometry, the pinned
    checkpoint (scripts/retrain_flagship.sh) is restored instead."""
    if TRAINED and flagship:
        from bench import load_params
        from mdcnet_tpu.config import large_preset
        cfg = large_preset()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    vocab_size=332))
        params, workload, _ = load_params(model, cfg)
        assert workload.startswith("trained"), "no trained checkpoint"
        return params
    images1 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    return jax.jit(model.init)({"params": jax.random.PRNGKey(1)}, images1,
                               jnp.zeros((1, 10), jnp.int32))


def report(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def config1(quick):
    """Single-image greedy caption p50 latency."""
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model

    cfg = large_preset()
    if TRAINED:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    vocab_size=332))
    model = build_model(cfg.model)
    params = init_params(model, 224, flagship=True)
    image = jax.random.uniform(jax.random.PRNGKey(0), (1, 224, 224, 3))
    p50, mean = timed(lambda: generate(
        model, params, image, jax.random.PRNGKey(2),
        steps=cfg.infer.generation_steps, greedy=True,
        early_exit=TRAINED).tokens, iters=3 if quick else 10)
    report("1_single_image_greedy", p50_latency_ms=round(p50 * 1000, 2),
           mean_latency_ms=round(mean * 1000, 2), trained=TRAINED)


def config2(quick):
    """Batch-32 beam-3 captioning at 224²."""
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.beam import beam_search
    from mdcnet_tpu.models import build_model

    cfg = large_preset()
    if TRAINED:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    vocab_size=332))
    model = build_model(cfg.model)
    params = init_params(model, 224, flagship=True)
    images = jax.random.uniform(jax.random.PRNGKey(0), (32, 224, 224, 3))
    p50, mean = timed(lambda: beam_search(
        model, params, images, steps=cfg.infer.generation_steps,
        beam_size=3).tokens, iters=2 if quick else 5)
    report("2_batch32_beam3", p50_latency_ms=round(p50 * 1000, 2),
           images_per_sec=round(32 / mean, 1), trained=TRAINED)


def config3(quick):
    """Axial-attention variant, batch 64."""
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model

    cfg = large_preset()
    mc = dataclasses.replace(cfg.model, axial=True)
    model = build_model(mc)
    params = init_params(model, 224)
    images = jax.random.uniform(jax.random.PRNGKey(0), (64, 224, 224, 3))
    p50, mean = timed(lambda: generate(
        model, params, images, jax.random.PRNGKey(2),
        steps=cfg.infer.generation_steps, early_exit=False).tokens,
        iters=2 if quick else 5)
    report("3_axial_batch64", images_per_sec=round(64 / mean, 1))


def config4(quick):
    """Generation fused with the on-device IoU decode pipeline."""
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.ops import boxes as box_ops
    from mdcnet_tpu.text import decode_jax

    cfg = large_preset()
    if TRAINED:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    vocab_size=332))
    model = build_model(cfg.model)
    params = init_params(model, 224, flagship=True)
    batch = 64
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 224, 224, 3))
    gt_seq = jnp.tile(jnp.asarray([[300, 303, 270, 304, 263, 10, 20, 110,
                                    120, 301] + [302] * 89], jnp.int32),
                      (batch, 1))

    @jax.jit
    def box_metrics(tokens, gt_seq):
        pred = decode_jax.decode_groups(tokens, max_groups=8)
        gt = decode_jax.decode_groups(gt_seq, max_groups=8)
        pb = decode_jax.rescale_boxes(pred.boxes, 224, 224, 224)
        gb = decode_jax.rescale_boxes(gt.boxes, 224, 224, 224)
        loss, _ = box_ops.giou_loss_with_scores(pb, pred.valid_mask(),
                                                gb, gt.valid_mask())
        iou = box_ops.mean_max_iou(pb, pred.valid_mask(), gb, gt.valid_mask())
        return loss, iou

    def step(rng):
        # generate is itself jitted; wrapping it in another jit makes one
        # giant program the remote compiler rejects — keep two dispatches
        res = generate(model, params, images, rng, greedy=True,
                       steps=cfg.infer.generation_steps, early_exit=TRAINED)
        return box_metrics(res.tokens, gt_seq)

    p50, mean = timed(lambda: step(jax.random.PRNGKey(2)),
                      iters=2 if quick else 5)
    report("4_fused_caption_iou_eval", images_per_sec=round(batch / mean, 1),
           trained=TRAINED)


def config5(quick):
    """512² context-parallel streaming eval."""
    from mdcnet_tpu.config import streaming_preset
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.parallel import sharding as sh
    from mdcnet_tpu.parallel.streaming import streaming_eval_step

    cfg = streaming_preset()
    model = build_model(cfg.model)
    params = init_params(model, 512)
    n_ctx = 1 if len(jax.devices()) < 2 else min(4, len(jax.devices()))
    mesh = sh.make_mesh(data=1, context=n_ctx)
    batch = 4 if quick else 8
    images = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 512, 512, 3))
    p50, mean = timed(lambda: streaming_eval_step(
        model, params, images, mesh, jax.random.PRNGKey(2),
        steps=40, early_exit=False).tokens, iters=2 if quick else 5)
    report("5_streaming_512_ctx_parallel", context_axis=n_ctx,
           images_per_sec=round(batch / mean, 2))


def config6(quick):
    """Continuous-batching serving engine: request latency p50/p99 at the
    flagship geometry (Poisson-less closed-loop batch of requests)."""
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.serve import Request, ServingEngine, latency_stats

    cfg = large_preset()
    if TRAINED:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    vocab_size=332))
    model = build_model(cfg.model)
    params = init_params(model, 224, flagship=True)
    n_req = 32 if quick else 128
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (n_req, 224, 224, 3))
    eng = ServingEngine(model, params, slots=32, admit_width=8,
                        max_steps=cfg.infer.generation_steps)
    eng.serve([Request(rid=-1, image=images[0])])  # compile + warm
    reqs = [Request(rid=i, image=images[i]) for i in range(n_req)]
    t0 = time.perf_counter()
    comps = eng.serve(reqs)
    wall = time.perf_counter() - t0
    stats = latency_stats(comps)
    report("6_serving_engine", requests=n_req,
           images_per_sec=round(n_req / wall, 1), trained=TRAINED, **stats)


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}


def main():
    global TRAINED
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--trained", action="store_true",
                    help="flagship-geometry configs (1,2,4,6) load the "
                    "pinned checkpoint and run the early-exit workload; "
                    "3 (axial) and 5 (streaming) have their own geometry "
                    "and stay untrained")
    args = ap.parse_args()
    TRAINED = args.trained
    for idx in [int(c) for c in args.configs.split(",")]:
        try:
            CONFIGS[idx](args.quick)
        except Exception as e:  # report and continue — partial data beats none
            report(f"{idx}_failed", error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
