"""Context-parallel streaming encoder tests (8 virtual CPU devices)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import test_preset
from mdcnet_tpu.models import build_model
from mdcnet_tpu.parallel import sharding as sh
from mdcnet_tpu.parallel.streaming import (encode_context_parallel,
                                           streaming_eval_step)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    cfg = test_preset().model
    # streaming geometry: bigger image -> 16 patch tokens, no CLS
    cfg = dataclasses.replace(cfg, img_size=64, num_patches=16,
                              enc_cls_token=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    params = model.init({"params": rng}, images, jnp.zeros((4, 10), jnp.int32))
    return cfg, model, params, images


class TestStreamingEncoder:
    @pytest.mark.parametrize("ctx", [2, 4])
    def test_matches_single_device_encode(self, setup, ctx):
        cfg, model, params, images = setup
        want = model.apply(params, images, method="encode")
        mesh = sh.make_mesh(data=2, context=ctx)
        got = encode_context_parallel(
            model.encoder, {"params": params["params"]["encoder"]},
            images, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_streaming_eval_step_runs_and_matches_plain_generate(self, setup):
        from mdcnet_tpu.infer.generate import generate
        cfg, model, params, images = setup
        mesh = sh.make_mesh(data=2, context=2)
        out = streaming_eval_step(model, params, images, mesh,
                                  jax.random.PRNGKey(0), steps=8)
        want = generate(model, params, images, jax.random.PRNGKey(0), steps=8)
        np.testing.assert_array_equal(np.asarray(out.tokens),
                                      np.asarray(want.tokens))
