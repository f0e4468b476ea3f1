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


def hybrid_mesh(model: int = 1, context: int = 1):
    """DCN-aware mesh for pod slices: the ``data`` axis spans hosts over DCN
    (gradient psum is the only cross-host collective and it is
    latency-tolerant), while ``model``/``context`` axes stay inside a host's
    ICI domain where the chatty TP/ring collectives belong (SURVEY §5.8).

    Falls back to a flat mesh on a single process.
    """
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    from mdcnet_tpu.parallel.sharding import AXES, make_mesh

    procs = jax.process_count()
    if procs == 1:
        return global_mesh(model=model, context=context)
    per_host = jax.device_count() // procs
    ici_data = per_host // (model * context)
    assert ici_data >= 1, (
        f"model*context={model * context} exceeds {per_host} devices/host — "
        "TP/CP must fit inside one ICI domain")
    try:
        # TPU multislice: granule = slice (DCN between slices)
        devices = mesh_utils.create_hybrid_device_mesh(
            (ici_data, model, context), (procs, 1, 1))
    except ValueError:
        # single-slice pods / CPU smoke: granule = process (DCN between hosts)
        devices = mesh_utils.create_hybrid_device_mesh(
            (ici_data, model, context), (procs, 1, 1),
            process_is_granule=True)
    return Mesh(devices, AXES)


def multihost_batch(mesh, *host_arrays):
    """Assemble global arrays from per-host shards: every process passes its
    LOCAL slice of the batch; the returned jax.Arrays are globally sharded
    over the mesh ``data`` axis (the multi-host analogue of
    parallel/sharding.data_parallel_batch)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    out = []
    for a in host_arrays:
        a = np.asarray(a)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            sharding, a, global_shape))
    return tuple(out)
