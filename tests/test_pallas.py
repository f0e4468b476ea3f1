"""Pallas kernel numerics vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.ops.attention import (decode_attention, flash_attention,
                                      reference_attention)


def qkv(rng, b=2, h=2, l=256, d=128, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    mk = lambda k: jax.random.normal(k, (b, h, l, d), dtype) * 0.5
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, causal):
        q, k, v = qkv(jax.random.PRNGKey(0))
        want = reference_attention(q, k, v, causal=causal)
        got = flash_attention(q, k, v, causal, 128, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_unaligned_length(self):
        q, k, v = qkv(jax.random.PRNGKey(1), l=196)  # encoder patch count
        want = reference_attention(q, k, v)
        got = flash_attention(q, k, v, False, 128, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_gradients_flow(self):
        q, k, v = qkv(jax.random.PRNGKey(2), l=128)
        f = lambda q, k, v: jnp.sum(flash_attention(q, k, v, False, 128, 128))
        g = lambda q, k, v: jnp.sum(reference_attention(q, k, v))
        grads_f = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        grads_g = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(grads_f, grads_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestDecodeAttention:
    @pytest.mark.parametrize("pos", [0, 5, 31])
    def test_matches_masked_reference(self, pos):
        rng = jax.random.PRNGKey(3)
        b, h, l, d = 2, 2, 32, 128
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, d)) * 0.5
        k = jax.random.normal(ks[1], (b, h, l, d)) * 0.5
        v = jax.random.normal(ks[2], (b, h, l, d)) * 0.5
        # reference: full attention with keys > pos masked
        bias = jnp.where(jnp.arange(l)[None, None, None, :] <= pos, 0.0,
                         -1e9)
        want = reference_attention(q[:, :, None], k, v, bias=bias)[:, :, 0]
        got = decode_attention(q, k, v, jnp.asarray(pos, jnp.int32),
                               block_k=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_ignores_garbage_beyond_pos(self):
        b, h, l, d = 1, 2, 32, 128
        q = jnp.ones((b, h, d))
        k = jnp.ones((b, h, l, d))
        v = jnp.ones((b, h, l, d))
        # poison the tail with NaNs; pos=3 must not read them
        k = k.at[:, :, 10:].set(jnp.nan)
        v = v.at[:, :, 10:].set(jnp.nan)
        out = decode_attention(q, k, v, jnp.asarray(3, jnp.int32), block_k=16)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


class TestFlashInEncoder:
    def test_flash_encoder_matches_default(self):
        import dataclasses
        import jax
        from mdcnet_tpu.models.vit import ViTEncoder
        enc = ViTEncoder(patch_size=16, img_size=64, dim=64, depth=2,
                         num_heads=2, out_dim=64)
        enc_flash = ViTEncoder(patch_size=16, img_size=64, dim=64, depth=2,
                               num_heads=2, out_dim=64, use_flash=True)
        images = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(1), images)
        a = enc.apply(params, images)
        b = enc_flash.apply(params, images)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
