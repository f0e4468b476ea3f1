"""Determinism and numeric-debug controls (SURVEY §5.2).

The reference's only quality control is seeding + cudnn determinism
(allied_files.py:6-12).  Under jit, JAX is deterministic by construction
given explicit PRNG keys; this module adds the debug modes the reference
lacks: NaN trapping and checked (bounds-verified) decode kernels.
"""
from __future__ import annotations

import contextlib
import os
import random
from typing import Iterator

import jax
import numpy as np


def seed_everything(seed: int = 42) -> jax.Array:
    """Seed host-side RNGs and return the root JAX key
    (allied_files.py:6-12 equivalent; device RNG is the returned key)."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Trap NaNs at op boundaries inside the block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_decode_groups(pred_seq, pred_scores=None, max_groups: int = 20):
    """decode_groups wrapped in checkify: verifies token ids fall inside the
    int32 domain and group counts stay within bounds; returns (err, result).
    Use in --debug runs; the unchecked kernel is the production path."""
    from jax.experimental import checkify
    import jax.numpy as jnp
    from mdcnet_tpu.text.decode_jax import decode_groups

    def body(seq, scores):
        out = decode_groups(seq, scores, max_groups=max_groups)
        checkify.check(jnp.all(out.count <= max_groups),
                       "decoded group count exceeds max_groups")
        checkify.check(jnp.all((out.labels >= -1) & (out.labels < 332)),
                       "label outside token domain")
        return out

    checked = checkify.checkify(body)
    return checked(pred_seq, pred_scores)
