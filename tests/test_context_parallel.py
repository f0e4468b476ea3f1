"""Ring attention over the context axis == full attention (8 CPU devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.ops.attention import reference_attention
from mdcnet_tpu.parallel import sharding as sh
from mdcnet_tpu.parallel.context import (context_sharded_attention,
                                         ring_attention)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def qkv(seed, b=2, h=2, l=64, d=32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, h, l, d)) * 0.5 for k in ks)


class TestRingAttention:
    @pytest.mark.parametrize("ctx", [2, 4])
    def test_matches_full_attention(self, ctx):
        q, k, v = qkv(0)
        mesh = sh.make_mesh(data=2, context=ctx)
        attn = context_sharded_attention(mesh)
        with mesh:
            got = attn(q, k, v)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_single_device_ring_is_plain_attention(self):
        q, k, v = qkv(1, l=16)
        got = ring_attention(q, k, v, axis_size=1)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_uneven_value_content(self):
        """Ring result must not depend on shard boundaries: permuted K/V
        contents across devices still attend globally."""
        q, k, v = qkv(2, l=32)
        mesh = sh.make_mesh(data=1, context=8)
        attn = context_sharded_attention(mesh)
        with mesh:
            got = attn(q, k, v)
        want = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
