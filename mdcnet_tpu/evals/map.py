"""Mean Average Precision (COCO-style) matching torchmetrics semantics.

The reference evaluates detection quality with torchmetrics
``MeanAveragePrecision(box_format='xyxy', iou_thresholds=[0.3])`` per batch
and per epoch (train_val_epoch.py:208-231, 389-403), and logs per-class mAP
(train_val_epoch.py:657-665).  torchmetrics wraps pycocotools evaluation:

  - predictions sorted by score (descending, stable),
  - greedy matching: each prediction takes the not-yet-matched GT of the
    same class with the highest IoU >= threshold,
  - precision envelope (running max from the right) sampled at 101 recall
    points 0.00, 0.01, ..., 1.00,
  - AP averaged over classes that have at least one GT box; classes with GT
    but no AP contribute; classes with no GT are skipped,
  - max 100 detections per image.

Host-side numpy implementation (eval is not a throughput path); equivalence
is tested against a reference implementation in tests/test_evals.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if len(pred) == 0 or len(gt) == 0:
        return np.zeros((len(pred), len(gt)))
    area_p = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    lt = np.maximum(pred[:, None, :2], gt[None, :, :2])
    rb = np.minimum(pred[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_p[:, None] + area_g[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


@dataclass
class MeanAveragePrecision:
    """Accumulating mAP metric.

    update() takes lists of per-image dicts with keys:
      preds:   boxes (N,4), scores (N,), labels (N,)
      targets: boxes (M,4), labels (M,)
    compute() returns {"map": float, "map_per_class": {label: ap}}.
    """

    iou_threshold: float = 0.3
    max_detections: int = 100
    class_metrics: bool = False
    _preds: List[Dict] = field(default_factory=list)
    _targets: List[Dict] = field(default_factory=list)

    def reset(self) -> None:
        self._preds, self._targets = [], []

    def update(self, preds: List[Dict], targets: List[Dict]) -> None:
        for p, t in zip(preds, targets):
            self._preds.append({k: np.asarray(v) for k, v in p.items()})
            self._targets.append({k: np.asarray(v) for k, v in t.items()})

    def compute(self) -> Dict:
        classes = sorted({int(c) for t in self._targets
                          for c in np.asarray(t["labels"]).reshape(-1)})
        aps: Dict[int, float] = {}
        for cls in classes:
            aps[cls] = self._ap_for_class(cls)
        valid = [v for v in aps.values() if v >= 0]
        result = {"map": float(np.mean(valid)) if valid else -1.0}
        if self.class_metrics:
            result["map_per_class"] = aps
        return result

    def _ap_for_class(self, cls: int) -> float:
        scores_all: List[float] = []
        matched_all: List[bool] = []
        n_gt = 0
        for pred, tgt in zip(self._preds, self._targets):
            gt_mask = np.asarray(tgt["labels"]).reshape(-1) == cls
            gt_boxes = np.asarray(tgt["boxes"]).reshape(-1, 4)[gt_mask]
            n_gt += len(gt_boxes)

            p_labels = np.asarray(pred["labels"]).reshape(-1)
            p_mask = p_labels == cls
            p_boxes = np.asarray(pred["boxes"]).reshape(-1, 4)[p_mask]
            p_scores = np.asarray(pred["scores"]).reshape(-1)[p_mask]
            if len(p_scores) == 0:
                continue
            order = np.argsort(-p_scores, kind="stable")[: self.max_detections]
            p_boxes, p_scores = p_boxes[order], p_scores[order]

            iou = _iou_matrix(p_boxes, gt_boxes)
            taken = np.zeros(len(gt_boxes), bool)
            for i in range(len(p_boxes)):
                best, best_iou = -1, self.iou_threshold
                for j in range(len(gt_boxes)):
                    if taken[j] or iou[i, j] < best_iou:
                        continue
                    best, best_iou = j, iou[i, j]
                if best >= 0:
                    taken[best] = True
                    matched_all.append(True)
                else:
                    matched_all.append(False)
                scores_all.append(float(p_scores[i]))

        if n_gt == 0:
            return -1.0
        if not scores_all:
            return 0.0
        order = np.argsort(-np.asarray(scores_all), kind="stable")
        tp = np.asarray(matched_all)[order]
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(~tp)
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)

        # precision envelope (monotone from the right), sampled at 101 points
        for i in range(len(precision) - 1, 0, -1):
            precision[i - 1] = max(precision[i - 1], precision[i])
        idx = np.searchsorted(recall, RECALL_THRESHOLDS, side="left")
        prec_at = np.where(idx < len(precision), precision[np.minimum(
            idx, len(precision) - 1)], 0.0)
        return float(np.mean(prec_at))


def map_at_03(preds: List[Dict], targets: List[Dict],
              class_metrics: bool = False) -> Dict:
    """One-shot mAP@0.3 (the reference's per-batch usage,
    train_val_epoch.py:208-231)."""
    metric = MeanAveragePrecision(iou_threshold=0.3,
                                  class_metrics=class_metrics)
    metric.update(preds, targets)
    return metric.compute()
