"""Int8 KV-cache quantization tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import test_preset
from mdcnet_tpu.infer import generate
from mdcnet_tpu.models import build_model
from mdcnet_tpu.ops import kv_quant


class TestQuantOps:
    def test_roundtrip_error_bounded(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 2, 8, 16)).astype(np.float32))
        q = kv_quant.quantize(x)
        back = kv_quant.dequantize(q, jnp.float32)
        # symmetric int8: error <= scale/2 = max|x| / 254 per position
        amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
        assert (np.abs(np.asarray(back) - np.asarray(x)) <=
                amax / 254 + 1e-7).all()

    def test_update_slice(self, rng):
        cache = kv_quant.init_cache(1, 2, 4, 16)
        new = jnp.asarray(rng.normal(size=(1, 2, 1, 16)).astype(np.float32))
        cache = kv_quant.update_slice(cache, new, 2)
        got = kv_quant.dequantize(cache, jnp.float32)
        np.testing.assert_allclose(np.asarray(got[:, :, 2]),
                                   np.asarray(new[:, :, 0]), atol=1e-2)
        assert np.asarray(got[:, :, 0]).sum() == 0


class TestQuantGeneration:
    def test_quantized_generation_close_to_bf16(self):
        cfg = test_preset().model
        model = build_model(cfg)
        model_q = build_model(dataclasses.replace(cfg, kv_quant=True))
        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(jax.random.PRNGKey(3),
                                    (2, cfg.img_size, cfg.img_size, 3))
        params = model.init({"params": rng}, images,
                            jnp.zeros((2, 10), jnp.int32))
        out = generate(model, params, images, jax.random.PRNGKey(0), steps=8)
        out_q = generate(model_q, params, images, jax.random.PRNGKey(0),
                         steps=8)
        # same shapes; tokens may differ on a near-uniform untrained model,
        # but the machinery must run and produce valid ids
        assert out_q.tokens.shape == out.tokens.shape
        assert (np.asarray(out_q.tokens) >= 0).all()
        assert (np.asarray(out_q.tokens) < cfg.vocab_size).all()

    def test_quantized_single_step_logits_close(self):
        """One decode step with int8 caches stays near the bf16 logits."""
        cfg = test_preset().model
        cfg32 = dataclasses.replace(cfg, dtype="float32")
        model = build_model(cfg32)
        model_q = build_model(dataclasses.replace(cfg32, kv_quant=True))
        rng = jax.random.PRNGKey(1)
        images = jax.random.uniform(jax.random.PRNGKey(4),
                                    (2, cfg.img_size, cfg.img_size, 3))
        params = model.init({"params": rng}, images,
                            jnp.zeros((2, 10), jnp.int32))

        def one_step(m):
            enc = m.apply(params, images, method="encode")
            mem = m.apply(params, enc,
                          method=lambda mm, e: mm.decoder.prepare_memory(e))
            caches = m.decoder.init_cache(2, m.decoder.max_len - 1)
            valid = jnp.arange(m.decoder.max_len - 1)[None, :] <= 0
            valid = jnp.broadcast_to(valid, (2, m.decoder.max_len - 1))
            logits, _ = m.apply(
                params, jnp.array([300, 300], jnp.int32), 0, caches, mem,
                valid, method=lambda mm, *a: mm.decoder.decode_step(*a))
            return np.asarray(logits)

        base = one_step(model)
        quant = one_step(model_q)
        # logits differ only by quantization noise
        scale = np.abs(base).max()
        assert np.abs(base - quant).max() < 0.05 * scale + 0.05
