"""Context/sequence parallelism: ring attention over the mesh ``context`` axis.

For the 512² streaming-eval config the encoder sees 1024 patch tokens; this
module shards that sequence across chips.  Each device holds a local Q/K/V
shard; K/V blocks rotate around the ring via ``ppermute`` over ICI while a
flash-style online softmax accumulates partial attention — no device ever
materializes the full sequence (SURVEY §5.7 plan).

``ring_attention`` is numerically equal to full attention over the gathered
sequence (tests/test_context_parallel.py checks it on the 8-device CPU mesh).

Composition: ``context_parallel_call`` shard_maps a sequence-sharded function
over (batch -> data, tokens -> context).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str = "context",
                   axis_size: Optional[int] = None) -> jnp.ndarray:
    """Blockwise ring attention (non-causal, encoder-style).

    q/k/v: (B, H, L_local, D) — the local sequence shard inside shard_map.
    K/V shards travel the ring; each hop computes one block of scores and
    folds it into an online-softmax accumulator.
    """
    n = axis_size if axis_size is not None else jax.lax.axis_size(axis_name)
    dh = q.shape[-1]
    scale = dh ** -0.5
    qf = q.astype(jnp.float32) * scale

    b, h, lq, d = q.shape
    m0 = jnp.full((b, h, lq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, h, lq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, lq, d), jnp.float32)

    def step(carry, _):
        k_cur, v_cur, m, l, acc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        # rotate K/V shards one hop around the ring (ICI neighbor exchange)
        if n > 1:
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_cur, v_cur, m_new, l, acc), None

    (k_fin, v_fin, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), None, length=n)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def context_parallel_call(fn: Callable, mesh: Mesh, seq_axis: int = 1):
    """shard_map ``fn(x) -> y`` with batch over ``data`` and the sequence
    dimension over ``context``; all other dims replicated."""
    from jax import shard_map

    def spec_for(rank):
        parts = [None] * rank
        parts[0] = "data"
        parts[seq_axis] = "context"
        return P(*parts)

    def wrapped(x):
        spec = spec_for(x.ndim)
        return shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                         check_vma=False)(x)

    return wrapped


def context_sharded_attention(mesh: Mesh):
    """Returns an attention fn (B, H, L, D)³ -> (B, H, L, D) that runs
    ring attention with L sharded over the context axis."""
    from jax import shard_map

    n = mesh.shape["context"]
    spec = P("data", None, "context", None)

    def inner(q, k, v):
        return ring_attention(q, k, v, axis_name="context", axis_size=n)

    return shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)
