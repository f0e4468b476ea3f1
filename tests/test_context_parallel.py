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


class TestRingAttentionBackward:
    def test_gradients_match_full_attention(self):
        """ppermute transposes correctly under autodiff: ring-attention
        grads equal full-attention grads on the virtual mesh."""
        q, k, v = qkv(3, l=32)
        mesh = sh.make_mesh(data=2, context=4)
        attn = context_sharded_attention(mesh)
        tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)

        def loss_ring(q, k, v):
            return jnp.sum((attn(q, k, v) - tgt) ** 2)

        def loss_full(q, k, v):
            return jnp.sum((reference_attention(q, k, v) - tgt) ** 2)

        with mesh:
            g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_full):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5)


class TestContextParallelTraining:
    def test_512_style_train_step_matches_single_device(self):
        """The full 512²-style train step (sequence-sharded ring-attention
        encoder + decoder + composite loss + AdamW) produces the same
        updated params as the plain single-device step (VERDICT r1 item 7)."""
        import dataclasses
        from mdcnet_tpu.config import PAD_ID, test_preset
        from mdcnet_tpu.models import build_model
        from mdcnet_tpu.parallel.streaming import make_context_parallel_apply
        from mdcnet_tpu.train.state import create_train_state
        from mdcnet_tpu.train.step import make_train_step

        cfg = test_preset()
        # streaming-style geometry: no CLS token, 16 tokens over context=4.
        # dropout off: flax folds dropout rngs by module path, so the
        # decomposed CP apply draws different (equally valid) masks — the
        # equality claim is about the deterministic compute + gradients.
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, img_size=64),
            model=dataclasses.replace(cfg.model, img_size=64,
                                      num_patches=16, enc_cls_token=False,
                                      dec_pos_dropout=0.0,
                                      dec_layer_dropout=0.0,
                                      patch_dropout_rate=0.0))
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(rng, (4, 64, 64, 3))
        y = np.full((4, cfg.data.max_len), PAD_ID, np.int32)
        y[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
        y = jnp.asarray(y)
        state = create_train_state(model, cfg, rng, images, y[:, :-1])

        plain_step, _ = make_train_step(model, cfg)
        s_plain, m_plain = plain_step(state, images, y)

        mesh = sh.make_mesh(data=2, context=4)
        cp_apply = make_context_parallel_apply(model, mesh)
        cp_step, cp_eval = make_train_step(model, cfg, apply_fn=cp_apply)
        with mesh:
            s_cp, m_cp = cp_step(state, images, y)
            jax.block_until_ready(m_cp)

        np.testing.assert_allclose(float(m_cp["total_loss"]),
                                   float(m_plain["total_loss"]), rtol=2e-4)
        # updated params agree leaf-by-leaf (gradients flowed through the
        # ring identically)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(s_plain.params),
                jax.tree_util.tree_leaves_with_path(s_cp.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5,
                err_msg=jax.tree_util.keystr(pa))

        # eval path also agrees
        m_plain_eval, _ = make_train_step(model, cfg)[1](s_plain, images, y)
        with mesh:
            m_cp_eval, _ = cp_eval(s_cp, images, y)
        np.testing.assert_allclose(float(m_cp_eval["ce_loss"]),
                                   float(m_plain_eval["ce_loss"]), rtol=2e-4)
