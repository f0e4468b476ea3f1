"""Device mesh + sharding rules (pjit/NamedSharding).

The reference is single-GPU with no distributed code of any kind (SURVEY §2:
device pinned to ``cuda:1``, allied_files.py:16).  This module is the
TPU-native scale-out layer built the XLA way: declare a mesh and param/batch
PartitionSpecs, let the compiler insert the collectives (psum for grad
reduction over ``data``, all-gather/reduce-scatter around the ``model``-sharded
matmuls over ICI).

Axes:
  data    — batch (DP).  Gradients are psum-reduced by XLA automatically.
  model   — tensor parallel: attention heads and FFN hidden sharded; the
            pattern is Megatron-style column->row so each decoder block needs
            exactly one all-reduce per sublayer.
  context — sequence/context parallel axis for long-sequence encoder
            attention (512²+ images); unused (=1) at reference scale.

Rules are matched on flattened parameter paths, so they apply to any of the
model presets without per-model code.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "model", "context")

# (path regex, PartitionSpec) — first match wins; default replicated.
# Dense kernels are (in, out): column-parallel = shard out, row-parallel =
# shard in.
PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: q/k/v column-parallel (heads split), out row-parallel
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*out_proj/kernel$", P("model", None)),
    # FFN: fc1/linear1 column-parallel, fc2/linear2 row-parallel
    (r".*(linear1|mlp_fc1)/kernel$", P(None, "model")),
    (r".*(linear1|mlp_fc1)/bias$", P("model")),
    (r".*(linear2|mlp_fc2)/kernel$", P("model", None)),
    # axial attention block
    (r".*to_qkv/kernel$", P(None, "model")),
    (r".*to_out/kernel$", P("model", None)),
    # token embedding and output head: shard the embedding dim
    (r".*embedding/embedding$", P(None, "model")),
    (r".*output/kernel$", P("model", None)),
)


def make_mesh(data: int = 1, model: int = 1, context: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model * context
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = mesh_utils.create_device_mesh((data, model, context),
                                              devices=devices[:n])
    return Mesh(dev_array, AXES)


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Pick a (data, model) factorization: model axis of 2 when the device
    count is even and > 2, everything else data-parallel."""
    n = n_devices if n_devices is not None else len(jax.devices())
    model = 2 if (n % 2 == 0 and n > 2) else 1
    return make_mesh(data=n // model, model=model)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for(path_str: str, value) -> P:
    for pattern, spec in PARAM_RULES:
        if re.match(pattern, path_str):
            # only apply when dims are compatible (rank + divisibility are
            # re-checked in shard_params against the live mesh)
            if len(spec) <= np.ndim(value):
                return spec
    return P()


def param_specs(params) -> Any:
    """PartitionSpec pytree for a parameter pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: spec_for(_path_str(path), v), params)


def _validated(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharded axes that don't divide the dimension size."""
    out = []
    for dim, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis]
        out.append(axis if shape[dim] % size == 0 else None)
    return P(*out)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to PARAM_RULES."""
    def place(path, v):
        spec = _validated(spec_for(_path_str(path), v), v.shape, mesh)
        return jax.device_put(v, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, mesh: Mesh, tx=None):
    """Lay a full TrainState out on the mesh — the single blessed path.

    Params are placed by PARAM_RULES; optimizer moments are sharded exactly
    like their params: opt-state leaf paths embed the param path
    (``0/mu/decoder/.../kernel``), so the same ``.*``-prefixed PARAM_RULES
    match them directly, with divisibility re-validated per leaf.  Scalars
    (Adam ``count``, step, rng) are replicated.  Values are preserved, so
    resumed states keep their Adam statistics.  Multi-host safe: every leaf
    gets an explicit NamedSharding over the global mesh (the jit-layout trick
    this replaces left scalars on a single device under multi-process).

    ``tx`` is accepted for backward compatibility and unused.
    """
    del tx

    def place(path, v):
        spec = _validated(spec_for(_path_str(path), v), np.shape(v), mesh)
        return jax.device_put(v, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(place, state.params)
    opt_state = jax.tree_util.tree_map_with_path(place, state.opt_state)
    replicated = NamedSharding(mesh, P())
    return state.replace(params=params, opt_state=opt_state,
                         step=jax.device_put(state.step, replicated),
                         rng=jax.device_put(state.rng, replicated))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs sharded over the data axis, replicated over model/context."""
    return NamedSharding(mesh, P("data"))


def data_parallel_batch(mesh: Mesh, *arrays):
    """Place host arrays with the batch dim sharded over ``data``."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)
