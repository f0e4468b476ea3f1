"""Serving-engine tests: continuous batching ≡ batch generate, slot reuse.

The engine admits mixed requests into a fixed slot pool and decodes every
slot at its own depth; greedy outputs must be token-identical to the batch
``infer.generate`` path on the same images (same params, same preprocess).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import BOS_ID, EOS_ID, PAD_ID, test_preset
from mdcnet_tpu.data.augment import preprocess
from mdcnet_tpu.infer.generate import generate_from_memory
from mdcnet_tpu.models import build_model
from mdcnet_tpu.serve import Request, ServingEngine, latency_stats


@pytest.fixture(scope="module")
def setup():
    cfg = test_preset().model
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = (np.random.default_rng(5).random(
        (6, cfg.img_size, cfg.img_size, 3)) * 255).astype(np.uint8)
    tgt = jnp.zeros((2, 10), jnp.int32)
    params = model.init(
        {"params": rng},
        jnp.zeros((2, cfg.img_size, cfg.img_size, 3)), tgt)
    return cfg, model, params, images


def batch_reference(model, params, images, img_size, steps):
    """The established batch path: preprocess -> encode -> cached greedy."""
    x = preprocess(jnp.asarray(images, jnp.float32), jax.random.PRNGKey(0),
                   img_size, train=False)
    enc = model.apply(params, x, method="encode")
    out = generate_from_memory(model, params, enc, jax.random.PRNGKey(0),
                               steps=steps, greedy=True, early_exit=False)
    return np.asarray(out.tokens)


def _row_until_eos(row):
    eos = np.flatnonzero(row == EOS_ID)
    end = int(eos[0]) + 1 if eos.size else len(row)
    return row[:end]


class TestServeParity:
    def test_tokens_match_batch_generate(self, setup):
        cfg, model, params, images = setup
        # fewer slots than requests forces slot reuse mid-flight
        eng = ServingEngine(model, params, slots=2, admit_width=2,
                            segment_steps=4, img_size=cfg.img_size)
        reqs = [Request(rid=i, image=images[i]) for i in range(len(images))]
        comps = eng.serve(reqs)
        assert len(comps) == len(reqs)
        ref = batch_reference(model, params, images, cfg.img_size,
                              eng.max_steps)
        by_rid = {c.rid: c for c in comps}
        for i in range(len(images)):
            got = _row_until_eos(by_rid[i].tokens)
            np.testing.assert_array_equal(
                got, ref[i][: len(got)],
                err_msg=f"request {i} diverged from batch generate")

    def test_mixed_arrivals_and_stats(self, setup):
        cfg, model, params, images = setup
        eng = ServingEngine(model, params, slots=4, admit_width=2,
                            segment_steps=4, img_size=cfg.img_size)
        # staggered open-loop arrivals; later requests queue behind slots
        reqs = [Request(rid=i, image=images[i % len(images)],
                        arrival=0.02 * i) for i in range(8)]
        t0 = time.perf_counter()
        comps = eng.serve(reqs)
        stats = latency_stats(comps, time.perf_counter() - t0)
        assert stats["requests"] == 8
        assert stats["throughput_rps"] > 0
        assert stats["latency_p99_ms"] >= stats["latency_p50_ms"]
        # every completion is BOS-seeded and PAD beyond its EOS
        for c in comps:
            assert c.tokens[0] == BOS_ID
            eos = np.flatnonzero(c.tokens == EOS_ID)
            if eos.size:
                assert (c.tokens[int(eos[0]) + 1:] == PAD_ID).all()

    def test_speculative_matches_greedy_engine(self, setup):
        cfg, model, params, images = setup
        from mdcnet_tpu.infer.speculative import build_draft_tables
        # drafter content only affects speed, never tokens: exactness must
        # hold even for tables built from sequences the model never emits
        tables = build_draft_tables(
            [np.array([BOS_ID, 5, 6, 7, EOS_ID]),
             np.array([BOS_ID, 5, 6, 8, EOS_ID])], cfg.vocab_size)
        greedy = ServingEngine(model, params, slots=2, admit_width=2,
                               segment_steps=4, img_size=cfg.img_size)
        spec = ServingEngine(model, params, slots=2, admit_width=2,
                             segment_steps=4, img_size=cfg.img_size,
                             draft_tables=tables, draft_k=4)
        reqs = [Request(rid=i, image=images[i]) for i in range(4)]
        ref = {c.rid: c.tokens for c in greedy.serve(list(reqs))}
        got = {c.rid: c.tokens for c in spec.serve(list(reqs))}
        for i in range(4):
            np.testing.assert_array_equal(
                got[i], ref[i],
                err_msg=f"speculative engine diverged on request {i}")

    @pytest.mark.parametrize("speculative", [False, True])
    def test_slot_reuse_resets_state(self, setup, speculative):
        cfg, model, params, images = setup
        tables = None
        if speculative:
            from mdcnet_tpu.infer.speculative import build_draft_tables
            tables = build_draft_tables(
                [np.array([BOS_ID, 5, 6, 7, EOS_ID])], cfg.vocab_size)
        eng = ServingEngine(model, params, slots=1, admit_width=1,
                            segment_steps=4, img_size=cfg.img_size,
                            draft_tables=tables)
        # the same image through the single slot twice must give the same
        # tokens (stale cache/memory from the first occupant must not leak)
        reqs = [Request(rid=0, image=images[0]),
                Request(rid=1, image=images[0])]
        comps = eng.serve(reqs)
        a, b = sorted(comps, key=lambda c: c.rid)
        np.testing.assert_array_equal(a.tokens, b.tokens)
