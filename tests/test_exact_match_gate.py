"""The reference postprocess residue gate vs caption exact-match.

The reference nulls any generated sequence whose first EOS index i fails
``(i-1) % 5 == 0`` (inference_trail_after_good_map.py:51-53).  That rule
was written for bare [label, 4-coords]*k sequences; with the caption
prepended the residue depends on caption length, so every caption whose
position phrase is ONE word ("center", "left", ...) is nulled even when
generated PERFECTLY — while two-word phrases ("right bottom") pass.
test_epoch therefore reports the parity-faithful gated metric AND
``caption_exact_match_ungated`` (plain EOS-truncated decode).
"""
import numpy as np

import mdcnet_tpu.train.test_epoch as te_mod
from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.data.pipeline import Batch
from mdcnet_tpu.infer.generate import GenerateResult, postprocess
from mdcnet_tpu.models import build_model
from tests.test_text import make_tokenizer

BOX = [10.0, 10.0, 50.0, 50.0]
CAP_1WORD = "The defect silk_spot is located at the center of the image."
CAP_2WORD = "The defect water_spot is located at the right bottom of the image."


def _seq(tokenizer, caption, label=263):
    return np.asarray(tokenizer.process_single_pair(label, list(BOX),
                                                    caption), np.int32)


def test_residue_gate_nulls_one_word_position_phrases():
    tok = make_tokenizer()
    one = _seq(tok, CAP_1WORD)
    two = _seq(tok, CAP_2WORD)
    batch = np.full((2, max(len(one), len(two))), PAD_ID, np.int32)
    batch[0, : len(one)] = one
    batch[1, : len(two)] = two
    confs = np.full((2, batch.shape[1]), 0.9, np.float32)

    bboxes, labels, captions, _ = postprocess(batch, confs, tok)
    # perfect sequence, one-word position phrase: EOS residue fails -> None
    assert captions[0] is None and bboxes[0] is None
    # perfect sequence, two-word position phrase: passes the gate
    assert captions[1] is not None and "right bottom" in captions[1]


def _epoch_metrics(monkeypatch, caption):
    cfg = test_preset()
    tok = make_tokenizer(max_len=cfg.data.max_len)
    seq = _seq(tok, caption)
    tokens = np.full((1, cfg.data.max_len), PAD_ID, np.int32)
    tokens[0, : len(seq)] = seq
    batch = Batch(
        images=np.zeros((1, cfg.data.img_size, cfg.data.img_size, 3),
                        np.uint8),
        tokens=tokens,
        boxes=np.zeros((1, 1, 4), np.float32),
        labels=np.zeros((1, 1), np.int64))

    gen_tokens = tokens[:, : len(seq) + 1]  # generated == GT, PAD tail
    gen_confs = np.full((1, gen_tokens.shape[1] - 1), 0.9, np.float32)

    def fake(model, params, images, rng, **kw):
        return GenerateResult(tokens=gen_tokens, confs=gen_confs)

    monkeypatch.setattr(te_mod, "generate", fake)
    model = build_model(cfg.model)
    return te_mod.test_epoch(model, params=None, loader=[batch],
                             tokenizer=tok, cfg=cfg, class_metrics=False)


def test_gated_metric_is_capped_but_ungated_credits_perfect_output(
        monkeypatch):
    out = _epoch_metrics(monkeypatch, CAP_1WORD)
    assert out["test/caption_exact_match"] == 0.0          # gate artifact
    assert out["test/caption_exact_match_ungated"] == 1.0  # actual quality


def test_two_word_phrase_passes_both_metrics(monkeypatch):
    out = _epoch_metrics(monkeypatch, CAP_2WORD)
    assert out["test/caption_exact_match"] == 1.0
    assert out["test/caption_exact_match_ungated"] == 1.0
