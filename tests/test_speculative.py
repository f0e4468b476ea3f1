"""Speculative decoding: exactness vs greedy, drafter automaton, tables."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, CAPTION_START_ID,
                               EOS_ID, PAD_ID, test_preset)
from mdcnet_tpu.infer.generate import generate
from mdcnet_tpu.infer.speculative import (DraftTables, draft_tokens,
                                          build_draft_tables,
                                          generate_speculative)
from mdcnet_tpu.models import build_model


@pytest.fixture(scope="module")
def setup():
    cfg = test_preset().model
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(3),
                                (4, cfg.img_size, cfg.img_size, 3))
    tgt = jnp.zeros((4, 10), jnp.int32)
    params = model.init({"params": rng}, images, tgt)
    return cfg, model, params, images


@pytest.fixture(scope="module")
def gc10_tables(setup):
    cfg = setup[0]
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    records = ann.txt_file_to_records(
        "/root/reference/annotations_summary.txt", "/img")
    records = ann.take(records, np.arange(64))
    vocab = gc10_vocabulary(records["caption"].tolist())
    tok = SeqTokenizer(vocab, 10, 224, 224, 224, max_len=40)
    # raw annotation coords are in original-image pixels; the real pipeline
    # resizes to 224 before tokenizing — clamp here to stay in the bin range
    seqs = [tok.process_single_pair(int(records["label"][i]),
                                    [min(float(records[c][i]), 224.0) for c in
                                     ("xmin", "ymin", "xmax", "ymax")],
                                    records["caption"][i])
            for i in range(len(records["label"]))]
    return build_draft_tables([np.asarray(s) for s in seqs], cfg.vocab_size), tok


def assert_equivalent(model, params, images, tables, steps, draft_k,
                      conf_every=4):
    ref = generate(model, params, images, jax.random.PRNGKey(0), steps=steps,
                   greedy=True, conf_every=conf_every)
    got = generate_speculative(model, params, images, tables, steps=steps,
                               draft_k=draft_k, conf_every=conf_every)
    ref_t, got_t = np.asarray(ref.tokens), np.asarray(got.tokens)
    np.testing.assert_array_equal(got_t, ref_t)
    # confidences must agree at every committed (pre-EOS) recorded position
    ref_c, got_c = np.asarray(ref.confs), np.asarray(got.confs)
    for b in range(ref_t.shape[0]):
        eos = np.flatnonzero(ref_t[b] == EOS_ID)
        n_live = (int(eos[0]) if eos.size else steps)
        n_rec = (n_live + conf_every - 1) // conf_every
        np.testing.assert_allclose(got_c[b, :n_rec], ref_c[b, :n_rec],
                                   atol=1e-5)


class TestSpeculativeExactness:
    def test_random_params_no_eos(self, setup, gc10_tables):
        """Untrained model: every draft mismatches (worst case acc=1) —
        verification, scatter, and bookkeeping must still be exact."""
        cfg, model, params, images = setup
        assert_equivalent(model, params, images, gc10_tables[0],
                          steps=12, draft_k=4)

    def test_self_derived_tables_accept_path(self, setup):
        """Tables built from the model's OWN greedy outputs: the drafter now
        frequently predicts the model, exercising multi-token accepts."""
        cfg, model, params, images = setup
        ref = generate(model, params, images, jax.random.PRNGKey(0),
                       steps=12, greedy=True)
        tables = build_draft_tables(
            [np.asarray(r) for r in np.asarray(ref.tokens)], cfg.vocab_size)
        assert_equivalent(model, params, images, tables, steps=12, draft_k=4)

    def test_eos_bias_mixed_finish_times(self, setup, gc10_tables):
        """Bias EOS so rows finish at different steps: per-row positions,
        frozen rows, and the budget clamp must match greedy exactly."""
        cfg, model, params, images = setup
        p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        bias = p["params"]["decoder"]["output"]["bias"]
        p["params"]["decoder"]["output"]["bias"] = \
            bias.at[EOS_ID].add(2.5)
        assert_equivalent(model, params, images, gc10_tables[0],
                          steps=14, draft_k=4)
        assert_equivalent(model, p, images, gc10_tables[0],
                          steps=14, draft_k=6)
        # sanity: the biased model does emit EOS somewhere
        out = generate(model, p, images, jax.random.PRNGKey(0), steps=14,
                       greedy=True)
        assert (np.asarray(out.tokens) == EOS_ID).any()

    def test_draft_k_sweep(self, setup, gc10_tables):
        cfg, model, params, images = setup
        for k in (2, 3, 8):
            assert_equivalent(model, params, images, gc10_tables[0],
                              steps=10, draft_k=k)

    def test_block_impls_agree(self, setup, gc10_tables):
        """The scatter-free split verify (decode_block_split + deferred
        commit_blocks) must reproduce the scatter decode_block path exactly:
        same tokens, same confidences, same iteration count."""
        cfg, model, params, images = setup
        for k in (3, 5):
            a = generate_speculative(model, params, images, gc10_tables[0],
                                     steps=12, draft_k=k,
                                     block_impl="scatter")
            for impl in ("split", "split_gather", "split_unique"):
                b = generate_speculative(model, params, images,
                                         gc10_tables[0], steps=12,
                                         draft_k=k, block_impl=impl)
                np.testing.assert_array_equal(np.asarray(a.tokens),
                                              np.asarray(b.tokens))
                np.testing.assert_allclose(np.asarray(a.confs),
                                           np.asarray(b.confs), atol=1e-6)
                assert int(a.n_iters) == int(b.n_iters)

    def test_unique_impl_with_compaction(self, setup, gc10_tables):
        """split_unique + compact_to together (the serving configuration):
        the always-write lanes plus the post-loop stale cleanup must still
        reproduce greedy exactly across the phase-1/phase-2 boundary."""
        cfg, model, params, images = setup
        p = jax.tree_util.tree_map(lambda x: x, params)
        bias = p["params"]["decoder"]["output"]["bias"]
        p["params"]["decoder"]["output"]["bias"] = bias.at[EOS_ID].add(2.5)
        ref = generate_speculative(model, p, images, gc10_tables[0],
                                   steps=14, draft_k=4)
        got = generate_speculative(model, p, images, gc10_tables[0],
                                   steps=14, draft_k=4,
                                   block_impl="split_unique", compact_to=2)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_allclose(np.asarray(got.confs),
                                   np.asarray(ref.confs), atol=1e-6)

    def test_compaction_identical(self, setup, gc10_tables):
        """compact_to: phase-2 batch compaction (the raggedness fix) must
        move rows without changing a single token or confidence, for mixed
        finish times (EOS-biased model), the untrained all-run-to-budget
        case, and every compact size."""
        cfg, model, params, images = setup
        p = jax.tree_util.tree_map(lambda x: x, params)
        bias = p["params"]["decoder"]["output"]["bias"]
        p["params"]["decoder"]["output"]["bias"] = bias.at[EOS_ID].add(2.5)
        for prm in (p, params):
            ref = generate_speculative(model, prm, images, gc10_tables[0],
                                       steps=14, draft_k=4)
            for compact in (1, 2, 3, (3, 1), (3, 2, 1)):
                got = generate_speculative(model, prm, images,
                                           gc10_tables[0], steps=14,
                                           draft_k=4, compact_to=compact)
                np.testing.assert_array_equal(np.asarray(got.tokens),
                                              np.asarray(ref.tokens))
                np.testing.assert_allclose(np.asarray(got.confs),
                                           np.asarray(ref.confs), atol=1e-6)

    def test_n_iters_counter(self, setup, gc10_tables):
        """n_iters reports the verify-block count: bounded below by the
        ideal ceil(steps/K) schedule and above by one block per token
        (untrained model: every draft mismatches, so it hits the upper
        bound exactly; the greedy path leaves the field None)."""
        cfg, model, params, images = setup
        steps, k = 12, 4
        res = generate_speculative(model, params, images, gc10_tables[0],
                                   steps=steps, draft_k=k)
        n = int(res.n_iters)
        assert (steps + k - 1) // k <= n <= steps
        ref = generate(model, params, images, jax.random.PRNGKey(0),
                       steps=steps, greedy=True)
        assert ref.n_iters is None


class TestDrafter:
    def test_template_words_from_trigram(self, gc10_tables):
        """From (BOS, CAP_START) the drafter must roll out the dominant
        caption template prefix 'the defect ...'."""
        tables, tok = gc10_tables
        v = tok.vocab
        drafts = draft_tokens(tables,
                        jnp.asarray([BOS_ID]),
                        jnp.asarray([CAPTION_START_ID]),
                        jnp.asarray([PAD_ID]),
                        jnp.asarray([-1]), k=3)
        words = [v.itos.get(int(t), "?") for t in np.asarray(drafts[0])]
        assert words[0] == "the" and words[1] == "defect"

    def test_label_copy_and_structure_eos(self, gc10_tables):
        tables, _ = gc10_tables
        cls = jnp.asarray([260])
        # prev = CAP_END -> draft the copied class label
        drafts = draft_tokens(tables, jnp.asarray([7]),
                        jnp.asarray([CAPTION_END_ID]), cls,
                        jnp.asarray([0]), k=2)
        assert int(drafts[0, 0]) == 260
        # 5 tokens after CAP_END (label + 4 coords done) -> draft EOS
        drafts = draft_tokens(tables, jnp.asarray([120]), jnp.asarray([130]),
                        cls, jnp.asarray([5]), k=2)
        assert int(drafts[0, 0]) == EOS_ID

    def test_recycled_overrides_tables_not_structure(self, gc10_tables):
        """Recycled model predictions beat the n-gram tables, but the exact
        structural rules (label copy after CAP_END, EOS at since==5) beat
        recycled drafts."""
        tables, tok = gc10_tables
        v = tok.vocab
        # (BOS, CAP_START) would draft 'the' from the trigram; a recycled
        # model prediction must win instead
        rec = jnp.asarray([[77, -1]], jnp.int32)
        drafts = draft_tokens(tables, jnp.asarray([BOS_ID]),
                              jnp.asarray([CAPTION_START_ID]),
                              jnp.asarray([PAD_ID]), jnp.asarray([-1]),
                              k=3, recycled=rec)
        assert int(drafts[0, 0]) == 77
        # slot without a recycled draft (-1) falls back to the tables,
        # with the recycled token threaded through the n-gram carry
        the_id = v.stoi["the"]
        drafts = draft_tokens(tables, jnp.asarray([BOS_ID]),
                              jnp.asarray([CAPTION_START_ID]),
                              jnp.asarray([PAD_ID]), jnp.asarray([-1]),
                              k=3, recycled=jnp.asarray([[the_id, -1]],
                                                        jnp.int32))
        assert v.itos.get(int(drafts[0, 1]), "?") == "defect"
        # prev = CAP_END: label copy rule overrides a recycled draft
        drafts = draft_tokens(tables, jnp.asarray([7]),
                              jnp.asarray([CAPTION_END_ID]),
                              jnp.asarray([260]), jnp.asarray([0]),
                              k=2, recycled=jnp.asarray([[99]], jnp.int32))
        assert int(drafts[0, 0]) == 260
        # since==5: structure-EOS overrides a recycled draft
        drafts = draft_tokens(tables, jnp.asarray([120]), jnp.asarray([130]),
                              jnp.asarray([260]), jnp.asarray([5]),
                              k=2, recycled=jnp.asarray([[99]], jnp.int32))
        assert int(drafts[0, 0]) == EOS_ID

    def test_finished_rows_draft_pad(self, gc10_tables):
        tables, _ = gc10_tables
        drafts = draft_tokens(tables, jnp.asarray([5]), jnp.asarray([EOS_ID]),
                        jnp.asarray([PAD_ID]), jnp.asarray([-1]), k=4)
        assert np.all(np.asarray(drafts) == PAD_ID)


class TestBuildTables:
    def test_bigram_backoff_and_unseen(self):
        seqs = [np.asarray([BOS_ID, 5, 6, 7, EOS_ID]),
                np.asarray([BOS_ID, 5, 6, 8, EOS_ID])]
        t = build_draft_tables(seqs, 320)
        tri = np.asarray(t.trigram)
        bi = np.asarray(t.bigram)
        assert tri[BOS_ID, 5] == 6
        assert bi[5] == 6
        assert tri[200, 201] == -1 and bi[250] == -1

    def test_counts_stop_at_eos(self):
        seqs = [np.asarray([BOS_ID, 5, EOS_ID, 9, 9, 9])]
        t = build_draft_tables(seqs, 320)
        assert np.asarray(t.bigram)[9] == -1
