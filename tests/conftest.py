"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the standard JAX testing recipe).  These env
vars must be set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The `quick` tier: parity tests (torch / nltk / sklearn equivalence) plus
# pure-host logic — everything that runs in seconds because it never compiles
# an 8-device mesh program.  `pytest -m quick` is the per-commit gate; the
# full suite (~25 min, compile-bound) stays the pre-push / CI gate.
_QUICK_MODULES = {
    "test_boxes", "test_compat", "test_data", "test_encoder_parity",
    "test_evals", "test_native", "test_pretrained", "test_score_ranked_map",
    "test_synthetic", "test_text", "test_torch_parity", "test_utils",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
