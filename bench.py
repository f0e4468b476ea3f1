"""Headline benchmark: captioned 224x224 images/sec/chip.

Measures the full inference pipeline on the flagship geometry
(DeiT3-medium encoder + dim-1024/8-head/8-layer decoder, trail_01.py:158-160):
encoder forward + KV-cached autoregressive generation for the full
caption+label+bbox sequence (generation budget = CFG.generation_steps = 101,
capped by the model's max_len-1 = 99 context like the reference's predict
path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
5,000 captioned 224² images/sec/chip (the reference publishes no numbers —
BASELINE.md).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_TARGET = 5000.0  # images/sec/chip north star (BASELINE.json)


def main():
    from mdcnet_tpu.config import large_preset
    from mdcnet_tpu.infer.generate import generate
    from mdcnet_tpu.models import build_model

    cfg = large_preset()
    model = build_model(cfg.model)

    batch = 256
    steps = cfg.infer.generation_steps  # 101, capped to 98 inside generate

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(
        rng, (batch, cfg.data.img_size, cfg.data.img_size, 3), jnp.float32)
    tgt = jnp.zeros((batch, 10), jnp.int32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(1)},
                                 images, tgt)

    def run(key):
        out = generate(model, params, images, key, steps=steps, greedy=True)
        return out.tokens

    # warmup / compile.  NB: over the axon tunnel block_until_ready does not
    # actually synchronize; a host transfer (np.asarray) is the only reliable
    # fence, so timing uses an explicit device->host readback.
    import numpy as np
    np.asarray(run(jax.random.PRNGKey(2)))

    iters = 5
    start = time.perf_counter()
    for i in range(iters):
        tokens = run(jax.random.PRNGKey(3 + i))
    np.asarray(tokens)
    elapsed = time.perf_counter() - start

    images_per_sec = batch * iters / elapsed
    print(json.dumps({
        "metric": "captioned_224px_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
