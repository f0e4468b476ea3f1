"""Multi-host initialization (SURVEY §5.8).

The reference has no distributed backend of any kind (single pinned GPU,
allied_files.py:16).  The TPU-native story: ``jax.distributed.initialize``
joins the hosts of a pod slice; collectives ride ICI within a slice and DCN
across hosts via the same Mesh/pjit machinery used single-host
(parallel/sharding.py) — no NCCL-style library surface is needed.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join a multi-host run. No-ops on a single process with no coordinator
    configured (so single-host scripts can call it unconditionally)."""
    coordinator_address = coordinator_address or os.environ.get(
        "MDCNET_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(data: Optional[int] = None, model: int = 1,
                context: int = 1):
    """Mesh over all devices of all hosts: data axis defaults to
    device_count // (model * context)."""
    from mdcnet_tpu.parallel.sharding import make_mesh
    n = jax.device_count()
    data = data if data is not None else n // (model * context)
    return make_mesh(data=data, model=model, context=context)
