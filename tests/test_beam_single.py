"""Beam search and single-image inference tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import BOS_ID, EOS_ID, PAD_ID, test_preset
from mdcnet_tpu.infer import beam_search, generate, inference_single_image
from mdcnet_tpu.models import build_model


@pytest.fixture(scope="module")
def setup():
    cfg = test_preset().model
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(3),
                                (2, cfg.img_size, cfg.img_size, 3))
    params = model.init({"params": rng}, images, jnp.zeros((2, 10), jnp.int32))
    return cfg, model, params, images


class TestBeamSearch:
    def test_beam1_equals_greedy(self, setup):
        cfg, model, params, images = setup
        steps = 10
        greedy_out = generate(model, params, images, jax.random.PRNGKey(0),
                              steps=steps, greedy=True, early_exit=False)
        beam_out = beam_search(model, params, images, steps=steps,
                               beam_size=1)
        g = np.asarray(greedy_out.tokens)
        b = np.asarray(beam_out.tokens[:, 0])
        for row_g, row_b in zip(g, b):
            eos = np.flatnonzero(row_g == EOS_ID)
            end = int(eos[0]) + 1 if eos.size else len(row_g)
            np.testing.assert_array_equal(row_b[:end], row_g[:end])

    def test_beam3_scores_sorted_and_ge_greedy(self, setup):
        cfg, model, params, images = setup
        steps = 8
        out = beam_search(model, params, images, steps=steps, beam_size=3)
        assert out.tokens.shape == (2, 3, steps + 1)
        scores = np.asarray(out.log_probs)
        assert (np.diff(scores, axis=1) <= 1e-5).all()  # best-first
        # beam-3 top score >= beam-1 score (greedy path is in the beam)
        out1 = beam_search(model, params, images, steps=steps, beam_size=1)
        assert (scores[:, 0] >= np.asarray(out1.log_probs)[:, 0] - 1e-4).all()

    def test_beams_start_with_bos(self, setup):
        cfg, model, params, images = setup
        out = beam_search(model, params, images, steps=5, beam_size=2)
        assert (np.asarray(out.tokens)[:, :, 0] == BOS_ID).all()


class TestSingleImage:
    def test_runs_and_stops(self, setup):
        cfg, model, params, images = setup
        tokens = inference_single_image(model, params, images[0],
                                        jax.random.PRNGKey(0), max_len=12,
                                        top_k=5)
        assert len(tokens) <= 12
        assert EOS_ID not in tokens  # EOS stops the loop, never emitted
        assert all(0 <= t < cfg.vocab_size for t in tokens)
