"""Generation tests: KV-cached decode ≡ reference full-forward semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import BOS_ID, EOS_ID, PAD_ID, test_preset
from mdcnet_tpu.infer.generate import generate, postprocess
from mdcnet_tpu.models import build_model
from mdcnet_tpu.ops.sampling import top_k_top_p_filtering
from tests.test_text import make_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = test_preset().model
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(3),
                                (2, cfg.img_size, cfg.img_size, 3))
    tgt = jnp.zeros((2, 10), jnp.int32)
    params = model.init({"params": rng}, images, tgt)
    return cfg, model, params, images


def reference_greedy(model, params, images, steps):
    """The reference decode loop: full padded ``predict`` forward per step,
    next token = argmax of the logits at the last prefix position
    (predict splices a BOS row in front, so output_with_bos[:, len(prefix)]
    == raw logits at position len(prefix)-1)."""
    batch = images.shape[0]
    prefix = np.full((batch, 1), BOS_ID, dtype=np.int32)
    for _ in range(steps):
        out = model.apply(params, jnp.asarray(images), jnp.asarray(prefix),
                          method="predict")
        next_logits = np.asarray(out)[:, prefix.shape[1], :]
        nxt = next_logits.argmax(axis=-1).astype(np.int32)
        prefix = np.concatenate([prefix, nxt[:, None]], axis=1)
    return prefix


class TestKVCacheParity:
    def test_greedy_tokens_match_full_forward(self, setup):
        cfg, model, params, images = setup
        steps = 12
        ref = reference_greedy(model, params, images, steps)
        got = generate(model, params, images, jax.random.PRNGKey(0),
                       steps=steps, greedy=True)
        got_tokens = np.asarray(got.tokens)
        # compare until each row's first EOS (cached path freezes rows at PAD
        # after EOS; the reference loop keeps sampling)
        for b in range(ref.shape[0]):
            row_ref = ref[b]
            row_got = got_tokens[b]
            eos = np.flatnonzero(row_got == EOS_ID)
            end = int(eos[0]) + 1 if eos.size else len(row_got)
            np.testing.assert_array_equal(row_got[:end], row_ref[:end])

    def test_generate_shapes_and_confs(self, setup):
        cfg, model, params, images = setup
        out = generate(model, params, images, jax.random.PRNGKey(0), steps=8,
                       conf_every=4)
        assert out.tokens.shape == (2, 9)
        assert out.confs.shape == (2, 2)
        assert np.all(np.asarray(out.confs) > 0)

    def test_sampled_generation_runs(self, setup):
        cfg, model, params, images = setup
        out = generate(model, params, images, jax.random.PRNGKey(1), steps=8,
                       greedy=False, top_k=5, top_p=0.9)
        assert out.tokens.shape == (2, 9)


class TestTopKTopP:
    def test_matches_hf_semantics(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(4, 50)).astype(np.float32)

        def hf_filter(t, top_k, top_p):
            """transformers.top_k_top_p_filtering reference implementation."""
            t = torch.tensor(t)
            if top_k > 0:
                kth = torch.topk(t, top_k)[0][..., -1, None]
                t[t < kth] = -float("inf")
            if top_p < 1.0:
                sorted_logits, sorted_idx = torch.sort(t, descending=True)
                cum = torch.cumsum(torch.softmax(sorted_logits, dim=-1), dim=-1)
                remove = cum > top_p
                remove[..., 1:] = remove[..., :-1].clone()
                remove[..., 0] = 0
                t[remove.scatter(1, sorted_idx, remove)] = -float("inf")
            return t.numpy()

        for top_k, top_p in [(5, 1.0), (0, 0.7), (10, 0.9)]:
            want = hf_filter(logits.copy(), top_k, top_p)
            got = np.asarray(top_k_top_p_filtering(jnp.asarray(logits),
                                                   top_k, top_p))
            np.testing.assert_array_equal(np.isfinite(want), got > -1e8)


class TestPostprocess:
    def test_structure_gate_and_decode(self):
        tok = make_tokenizer(max_len=24)
        seq = tok.process_single_pair(
            263, (50.0, 60.0, 150.0, 170.0),
            "The defect silk_spot is located at the center of the image.")
        good = np.array(seq + [PAD_ID] * (24 - len(seq)))
        # EOS right after 4 coords + label + caption block: passes iff
        # (eos_idx - 1) % 5 == 0
        bad = good.copy()
        eos_pos = int(np.flatnonzero(good == EOS_ID)[0])
        bad[eos_pos] = PAD_ID
        bad[eos_pos - 1] = EOS_ID  # shift EOS -> breaks %5 structure
        preds = np.stack([good, bad])
        confs = np.full((2, 6), 0.9)
        bboxes, labels, captions, cf = postprocess(preds, confs, tok)
        if (eos_pos - 1) % 5 == 0:
            assert labels[0] == [263]
            assert captions[0].startswith("the defect silk_spot")
        assert labels[1] is None and bboxes[1] is None


class TestAxialGeneration:
    def test_axial_uncached_matches_reference_loop(self):
        """The axial variant generates via full predict re-forwards; tokens
        must match the manual reference loop exactly."""
        import dataclasses
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.models import build_model
        cfg = dataclasses.replace(test_preset().model, axial=True)
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(jax.random.PRNGKey(3),
                                    (2, cfg.img_size, cfg.img_size, 3))
        params = model.init({"params": rng}, images,
                            jnp.zeros((2, 10), jnp.int32))
        steps = 8
        got = generate(model, params, images, jax.random.PRNGKey(0),
                       steps=steps, greedy=True, early_exit=False)
        # manual loop: predict on PAD-padded prefix, argmax at prefix end
        width = cfg.max_len - 1
        prefix = np.full((2, width), PAD_ID, np.int32)
        prefix[:, 0] = BOS_ID
        for i in range(steps):
            out = model.apply(params, images, jnp.asarray(prefix),
                              method="predict")
            nxt = np.asarray(out)[:, i + 1, :].argmax(-1)
            prefix[:, i + 1] = nxt
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      prefix[:, : steps + 1])


class TestGreedyCompaction:
    def test_compaction_identical_mixed_eos(self):
        """Greedy batch compaction (compact_to) must be output-identical
        for rows finishing at different steps (EOS-biased model) and for
        the never-finishing untrained case."""
        from mdcnet_tpu.config import test_preset

        cfg = test_preset().model
        model = build_model(cfg)
        images = jax.random.uniform(jax.random.PRNGKey(3),
                                    (4, cfg.img_size, cfg.img_size, 3))
        params = model.init({"params": jax.random.PRNGKey(0)}, images,
                            jnp.zeros((4, 10), jnp.int32))
        biased = jax.tree_util.tree_map(lambda x: x, params)
        b = biased["params"]["decoder"]["output"]["bias"]
        biased["params"]["decoder"]["output"]["bias"] = b.at[EOS_ID].add(2.5)
        conf_every = 4
        for prm in (biased, params):
            ref = generate(model, prm, images, jax.random.PRNGKey(0),
                           steps=14, greedy=True, early_exit=True)
            for compact in (1, 2, 3, (3, 1), (3, 2, 1)):
                got = generate(model, prm, images, jax.random.PRNGKey(0),
                               steps=14, greedy=True, early_exit=True,
                               compact_to=compact)
                tok_ref = np.asarray(ref.tokens)
                np.testing.assert_array_equal(np.asarray(got.tokens),
                                              tok_ref)
                # confs agree at every pre-EOS recorded position (post-EOS
                # slots hold PAD-step junk in the uncompacted path and zeros
                # in the compacted one — postprocess never reads them)
                for b in range(tok_ref.shape[0]):
                    eos = np.flatnonzero(tok_ref[b] == EOS_ID)
                    n_live = int(eos[0]) if eos.size else 14
                    n_rec = (n_live + conf_every - 1) // conf_every
                    np.testing.assert_allclose(
                        np.asarray(got.confs)[b, :n_rec],
                        np.asarray(ref.confs)[b, :n_rec], atol=1e-6)
