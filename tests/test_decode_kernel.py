"""Fused int8 decode-attention kernel vs the jnp reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.ops import kv_quant
from mdcnet_tpu.ops.decode_kernel import fused_int8_decode_attention


def make_inputs(seed, b=4, h=2, l=64, d=128):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, d)) * 0.5
    k = kv_quant.quantize(jax.random.normal(ks[1], (b, h, l, d)) * 0.5)
    v = kv_quant.quantize(jax.random.normal(ks[2], (b, h, l, d)) * 0.5)
    return q, k, v


def jnp_reference(q, k, v, pos):
    """kv_quant.quant_attention with a <=pos mask."""
    l = k.values.shape[2]
    bias = jnp.where(jnp.arange(l)[None, None, None, :] <= pos, 0.0, -1e9)
    return kv_quant.quant_attention(q[:, :, None], k, v, bias)[:, :, 0]


class TestFusedKernel:
    @pytest.mark.parametrize("pos", [0, 7, 33, 63])
    def test_matches_jnp_reference(self, pos):
        q, k, v = make_inputs(0)
        want = jnp_reference(q, k, v, pos)
        got = fused_int8_decode_attention(q, k, v, jnp.asarray(pos, jnp.int32),
                                          block_l=16, batch_tile=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_unaligned_cache_length(self):
        q, k, v = make_inputs(1, l=99)  # the real max_len-1 cache
        pos = 42
        want = jnp_reference(q, k, v, pos)
        got = fused_int8_decode_attention(q, k, v, jnp.asarray(pos, jnp.int32),
                                          block_l=32, batch_tile=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_cross_attention_mode_full_length(self):
        """pos = L-1 covers the whole memory (cross-attention usage)."""
        q, k, v = make_inputs(2, l=32)
        want = jnp_reference(q, k, v, 31)
        got = fused_int8_decode_attention(q, k, v,
                                          jnp.asarray(31, jnp.int32),
                                          block_l=16, batch_tile=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_poisoned_tail_ignored(self):
        q, k, v = make_inputs(3, l=32)
        kv = k.values.at[:, :, 20:].set(127)
        kscale = k.scale.at[:, :, 20:].set(jnp.nan)
        k = kv_quant.QuantKV(kv, kscale)
        v = kv_quant.QuantKV(v.values, v.scale.at[:, :, 20:].set(jnp.nan))
        got = fused_int8_decode_attention(q, k, v, jnp.asarray(5, jnp.int32),
                                          block_l=16, batch_tile=2)
        assert np.isfinite(np.asarray(got)).all()
