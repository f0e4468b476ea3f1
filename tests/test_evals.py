"""Metric equivalence tests: BLEU vs nltk, mAP vs a direct COCO-style oracle."""
import numpy as np
import pytest

from mdcnet_tpu.evals import (AvgMeter, MeanAveragePrecision,
                              calculate_bleu_scores, map_at_03, sentence_bleu)


class TestBleu:
    CASES = [
        ([10, 11, 12, 13, 14, 15], [10, 11, 12, 13, 14, 15]),     # exact
        ([10, 11, 12, 13, 14, 15], [10, 11, 12, 13, 99, 98]),     # partial
        ([10, 11, 12, 13], [13, 12, 11, 10]),                     # permuted
        ([10, 11, 12, 13, 14, 15, 16, 17], [10, 11]),             # short hyp
        ([10, 11], [10, 11, 12, 13, 14, 15]),                     # long hyp
        ([1, 2], [3, 4]),                                         # disjoint
        ([1, 2, 3], [1]),                                         # len 1
    ]

    @pytest.mark.parametrize("ref,hyp", CASES)
    def test_matches_nltk_method1(self, ref, hyp):
        nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
        want = nltk_bleu.sentence_bleu(
            [ref], hyp,
            smoothing_function=nltk_bleu.SmoothingFunction().method1)
        got = sentence_bleu([ref], hyp)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_batch_helper(self):
        # exact 3-token match: 4-gram numerator is 0, method1 smoothing keeps
        # the score below 1 (same value nltk produces)
        scores = calculate_bleu_scores([[1, 2, 3]], [[1, 2, 3]])
        assert scores[0] == pytest.approx(0.5623413251903491)
        long = list(range(10))
        assert calculate_bleu_scores([long], [long])[0] == pytest.approx(1.0)


class TestMap:
    def perfect_case(self):
        preds = [{"boxes": [[10, 10, 50, 50]], "scores": [0.9],
                  "labels": [263]}]
        targets = [{"boxes": [[10, 10, 50, 50]], "labels": [263]}]
        return preds, targets

    def test_perfect_detection(self):
        preds, targets = self.perfect_case()
        assert map_at_03(preds, targets)["map"] == pytest.approx(1.0)

    def test_miss_is_zero(self):
        preds = [{"boxes": [[100, 100, 120, 120]], "scores": [0.9],
                  "labels": [263]}]
        targets = [{"boxes": [[10, 10, 50, 50]], "labels": [263]}]
        assert map_at_03(preds, targets)["map"] == pytest.approx(0.0)

    def test_wrong_class_is_zero(self):
        preds = [{"boxes": [[10, 10, 50, 50]], "scores": [0.9],
                  "labels": [261]}]
        targets = [{"boxes": [[10, 10, 50, 50]], "labels": [263]}]
        assert map_at_03(preds, targets)["map"] == pytest.approx(0.0)

    def test_no_predictions_is_zero(self):
        preds = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                  "labels": np.zeros(0, np.int64)}]
        targets = [{"boxes": [[10, 10, 50, 50]], "labels": [263]}]
        assert map_at_03(preds, targets)["map"] == pytest.approx(0.0)

    def test_ranking_matters(self):
        """A high-scoring FP before the TP lowers AP below 1."""
        preds = [{"boxes": [[200, 200, 210, 210], [10, 10, 50, 50]],
                  "scores": [0.95, 0.9], "labels": [263, 263]}]
        targets = [{"boxes": [[10, 10, 50, 50]], "labels": [263]}]
        m = map_at_03(preds, targets)["map"]
        assert 0.0 < m < 1.0
        # COCO 101-pt: precision 0.5 over the whole recall range (envelope)
        assert m == pytest.approx(0.5, abs=0.01)

    def test_per_class(self):
        preds = [{"boxes": [[10, 10, 50, 50], [60, 60, 90, 90]],
                  "scores": [0.9, 0.8], "labels": [263, 261]}]
        targets = [{"boxes": [[10, 10, 50, 50], [200, 200, 220, 220]],
                    "labels": [263, 261]}]
        out = map_at_03(preds, targets, class_metrics=True)
        assert out["map_per_class"][263] == pytest.approx(1.0)
        assert out["map_per_class"][261] == pytest.approx(0.0)
        assert out["map"] == pytest.approx(0.5)

    def test_accumulation_across_updates(self):
        metric = MeanAveragePrecision(iou_threshold=0.3)
        p, t = self.perfect_case()
        metric.update(p, t)
        metric.update(p, t)
        assert metric.compute()["map"] == pytest.approx(1.0)
        metric.reset()
        assert metric.compute()["map"] == -1.0

    def test_iou_threshold_03(self):
        """IoU ~0.47 box counts at threshold 0.3, IoU ~0.28 does not."""
        preds = [{"boxes": [[10, 10, 50, 50]], "scores": [0.9],
                  "labels": [263]}]
        hit = [{"boxes": [[20, 20, 55, 55]], "labels": [263]}]     # IoU .467
        miss = [{"boxes": [[25, 25, 60, 60]], "labels": [263]}]    # IoU .284
        assert map_at_03(preds, hit)["map"] == pytest.approx(1.0)
        assert map_at_03(preds, miss)["map"] == pytest.approx(0.0)


class TestMeter:
    def test_weighted_average(self):
        m = AvgMeter("x")
        m.update(1.0, 2)
        m.update(4.0, 1)
        assert m.avg == pytest.approx(2.0)
