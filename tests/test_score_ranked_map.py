"""Score-ranked mAP through the generation eval path.

The reference ranks detections by the mean probability of their four
coordinate tokens (data_processing.py:601-666, consumed by
train_val_epoch.py:172-231).  These tests pin the rebuild's test_epoch to
that semantics end-to-end: with identical predicted boxes, flipping which
box carries the higher coordinate-token confidence must change mAP.
"""
import numpy as np
import pytest

import mdcnet_tpu.train.test_epoch as te_mod
from mdcnet_tpu.config import BOS_ID, EOS_ID, PAD_ID, test_preset
from mdcnet_tpu.data.pipeline import Batch
from mdcnet_tpu.infer.generate import GenerateResult
from mdcnet_tpu.models import build_model
from tests.test_text import make_tokenizer

LABEL = 263


def _gt_batch(cfg):
    """One image, one GT box (10,10,50,50) of class LABEL."""
    tokens = np.full((1, cfg.data.max_len), PAD_ID, np.int32)
    seq = [BOS_ID, LABEL, 10, 10, 50, 50, EOS_ID]
    tokens[0, : len(seq)] = seq
    images = np.zeros((1, cfg.data.img_size, cfg.data.img_size, 3), np.uint8)
    return Batch(images=images, tokens=tokens,
                 boxes=np.zeros((1, 1, 4), np.float32),
                 labels=np.zeros((1, 1), np.int64))


def _fake_generate(fp_conf, tp_conf):
    """A generate() stand-in emitting a far-off FP box then the exact TP box,
    with per-token confidences fp_conf / tp_conf on the coordinate tokens."""
    seq = [BOS_ID,
           LABEL, 200, 200, 210, 210,   # FP: no overlap with GT
           LABEL, 10, 10, 50, 50,       # TP: IoU 1 with GT
           EOS_ID]
    tokens = np.asarray([seq], np.int32)
    confs = np.full((1, len(seq) - 1), 0.5, np.float32)
    confs[0, 1:5] = fp_conf    # token positions 2-5 (coords of box 1)
    confs[0, 6:10] = tp_conf   # token positions 7-10 (coords of box 2)

    def fake(model, params, images, rng, **kw):
        return GenerateResult(tokens=tokens, confs=confs)

    return fake


def _run(monkeypatch, fp_conf, tp_conf):
    cfg = test_preset()
    tokenizer = make_tokenizer(max_len=cfg.data.max_len)
    model = build_model(cfg.model)
    monkeypatch.setattr(te_mod, "generate", _fake_generate(fp_conf, tp_conf))
    out = te_mod.test_epoch(model, params=None, loader=[_gt_batch(cfg)],
                            tokenizer=tokenizer, cfg=cfg,
                            class_metrics=False)
    return out["test/map@0.3"]


class TestScoreRankedMap:
    def test_score_order_changes_ap(self, monkeypatch):
        """High-confidence FP ahead of the TP must halve AP vs the reverse —
        impossible if the path fed constant scores."""
        ap_tp_first = _run(monkeypatch, fp_conf=0.1, tp_conf=0.9)
        ap_fp_first = _run(monkeypatch, fp_conf=0.9, tp_conf=0.1)
        assert ap_tp_first == pytest.approx(1.0, abs=0.01)
        assert ap_fp_first == pytest.approx(0.5, abs=0.01)
