#!/usr/bin/env python
"""Pod-slice training launcher (multi-host).

Run the SAME command on every host of a TPU pod slice (e.g. via
``gcloud compute tpus tpu-vm ssh --worker=all --command=...``):

  python scripts/launch_pod.py --annotations ann.txt --images imgs/ \
      --model-axis 2 [--context-axis 1] [--epochs 150]

Per host it:
  1. joins the run with ``jax.distributed.initialize`` (on GCP TPU VMs the
     coordinator is auto-discovered; elsewhere set MDCNET_COORDINATOR,
     MDCNET_NUM_PROCESSES, MDCNET_PROCESS_ID),
  2. builds the DCN-aware hybrid mesh: the ``data`` axis spans hosts over
     DCN, ``model``/``context`` axes stay inside each host's ICI domain
     (core/distributed.hybrid_mesh),
  3. feeds its local batch shard through ``multihost_batch`` and runs the
     standard jitted train step — XLA inserts the cross-host gradient psum.

A 2-process CPU version of this flow is exercised by
tests/test_multihost.py, so the wiring is verified without a pod.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--images", default="")
    ap.add_argument("--preset", default="large")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-per-host", type=int, default=64)
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--context-axis", type=int, default=1)
    ap.add_argument("--checkpoint-dir", default="checkpoints_pod")
    ap.add_argument("--synthetic-images", action="store_true")
    ap.add_argument("--coordinator", default="",
                    help="host:port (blank = auto-detect / env)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    from mdcnet_tpu.core import distributed as dist
    dist.initialize(coordinator_address=args.coordinator or None,
                    num_processes=args.num_processes,
                    process_id=args.process_id)

    import jax
    print(f"[host {jax.process_index()}/{jax.process_count()}] "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices", flush=True)

    mesh = dist.hybrid_mesh(model=args.model_axis, context=args.context_axis)
    print(f"[host {jax.process_index()}] mesh {dict(mesh.shape)}", flush=True)

    from mdcnet_tpu import config as C
    from mdcnet_tpu.cli.main import load_data
    from mdcnet_tpu.train.loop import train_from_config

    cfg = {"large": C.large_preset, "neu": C.neu_preset,
           "tiny": C.tiny_preset, "test": C.test_preset}[args.preset]()
    # global batch = per-host batch x hosts; the loader yields per-host
    # batches which multihost_batch scatters over the data axis
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=args.batch_per_host),
        train=dataclasses.replace(cfg.train,
                                  checkpoint_dir=args.checkpoint_dir))
    records, tokenizer, cfg = load_data(args, cfg)
    state = train_from_config(cfg, records, tokenizer,
                              synthetic_images=args.synthetic_images,
                              epochs=args.epochs, mesh=mesh)
    if jax.process_index() == 0:
        print(f"done: {int(state.step)} steps", flush=True)


if __name__ == "__main__":
    main()
