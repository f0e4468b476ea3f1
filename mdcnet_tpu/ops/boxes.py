"""Vectorized box metrics: IoU, GIoU, masked batch reductions.

jnp re-expressions of the reference kernels:
  - ``pairwise_iou``  == ``bbox_iou`` (iou_calcualtions.py:5-40), NxM with
    1e-6 denominator epsilon
  - ``pairwise_giou`` == ``giou_pairwise`` (iou_calcualtions.py:220-255)
  - ``batch_max_iou`` == ``calculate_batch_max_iou[_torchvision]``
    (iou_calcualtions.py:59-105): max-over-GT IoU per predicted box,
    NaN-safe, with validity masks instead of Python-level filtering
  - ``giou_loss_with_scores`` (iou_calcualtions.py:165-208): per-image mean
    GIoU loss over valid boxes, fixed no-detection penalty of 1.0 per missed
    GT when an image has GTs but no predictions

All functions take fixed-shape (B, N, 4) arrays plus boolean validity masks,
so they run inside jit/pjit with zero host sync — the reference loops over
the batch in Python and syncs per image (SURVEY §3.2).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

EPS = 1e-6


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """box1: (..., N, 4), box2: (..., M, 4) -> IoU (..., N, M).
    Matches bbox_iou (iou_calcualtions.py:5-40) incl. the +1e-6 epsilon."""
    area1 = box_area(box1)[..., :, None]
    area2 = box_area(box2)[..., None, :]
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:], box2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / (union + EPS)


def pairwise_giou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """GIoU (..., N, M). Matches giou_pairwise (iou_calcualtions.py:220-255):
    NB the reference divides by raw ``union`` and ``enclosing_area`` with no
    epsilon; zero-area pairs produce NaN there — here the denominators get a
    tiny epsilon so masked-out entries can't poison reductions."""
    lt = jnp.maximum(pred[..., :, None, :2], gt[..., None, :, :2])
    rb = jnp.minimum(pred[..., :, None, 2:], gt[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(pred)[..., :, None] + box_area(gt)[..., None, :] - inter

    enc_lt = jnp.minimum(pred[..., :, None, :2], gt[..., None, :, :2])
    enc_rb = jnp.maximum(pred[..., :, None, 2:], gt[..., None, :, 2:])
    enc_wh = enc_rb - enc_lt
    enc_area = enc_wh[..., 0] * enc_wh[..., 1]

    iou = inter / (union + EPS)
    return iou - (enc_area - union) / (enc_area + EPS)


def batch_max_iou(pred: jnp.ndarray, pred_mask: jnp.ndarray,
                  gt: jnp.ndarray, gt_mask: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-over-GT IoU per valid predicted box.

    pred: (B, N, 4), gt: (B, M, 4) with boolean validity masks.
    Returns (values (B, N), valid (B, N)); matches
    calculate_batch_max_iou_torchvision (iou_calcualtions.py:78-105) which
    skips images with no preds or no GTs and nan_to_nums the rest.
    """
    iou = pairwise_iou(pred, gt)
    iou = jnp.where(gt_mask[:, None, :], iou, -jnp.inf)
    max_iou = jnp.max(iou, axis=-1)
    has_gt = jnp.any(gt_mask, axis=-1)
    valid = pred_mask & has_gt[:, None]
    return jnp.where(valid, jnp.nan_to_num(max_iou, neginf=0.0), 0.0), valid


def mean_max_iou(pred: jnp.ndarray, pred_mask: jnp.ndarray,
                 gt: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """Scalar mean of per-box max IoUs over all valid boxes in the batch
    (train_val_epoch.py:269-287 aggregates max_ious into one average)."""
    vals, valid = batch_max_iou(pred, pred_mask, gt, gt_mask)
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(vals) / jnp.maximum(n, 1), jnp.nan)


def giou_loss_with_scores(pred: jnp.ndarray, pred_mask: jnp.ndarray,
                          gt: jnp.ndarray, gt_mask: jnp.ndarray,
                          no_detection_penalty: float = 1.0
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked re-expression of giou_loss_with_scores
    (iou_calcualtions.py:165-208).

    Per image i:
      no preds & some GTs -> loss_i = penalty * num_GTs
      no preds & no GTs (or preds & no GTs) -> loss_i = 0
      otherwise           -> loss_i = 1 - mean(GIoU over valid NxM pairs)
    Returns (mean over batch, per-image (B, N, M) GIoU matrix with invalid
    pairs set to 0).

    The reference additionally drops all-zero rows before computing
    (iou_calcualtions.py:190-193); callers encode that in the masks
    (decode_jax's valid_mask never marks zero boxes valid).
    """
    giou = pairwise_giou(pred, gt)
    pair_mask = pred_mask[:, :, None] & gt_mask[:, None, :]
    giou = jnp.where(pair_mask, giou, 0.0)

    n_pairs = jnp.sum(pair_mask, axis=(1, 2))
    mean_giou = jnp.sum(giou, axis=(1, 2)) / jnp.maximum(n_pairs, 1)

    has_pred = jnp.any(pred_mask, axis=-1)
    n_gt = jnp.sum(gt_mask, axis=-1)
    loss_missed = no_detection_penalty * n_gt.astype(jnp.float32)

    per_image = jnp.where(
        has_pred & (n_gt > 0), 1.0 - mean_giou,
        jnp.where(~has_pred & (n_gt > 0), loss_missed, 0.0))
    return jnp.mean(per_image), giou


def iou_loss_individual(pred: jnp.ndarray, pred_mask: jnp.ndarray,
                        gt: jnp.ndarray, gt_mask: jnp.ndarray,
                        min_penalty: float = 0.1,
                        no_box_penalty: float = 1.0) -> jnp.ndarray:
    """Masked iou_loss_individual (iou_calcualtions.py:259-288): mean over
    predicted boxes of (1 - IoU), where zero IoUs are replaced by
    ``min_penalty``; ``no_box_penalty`` when an image has no predictions."""
    iou = pairwise_iou(pred, gt)
    iou = jnp.where(iou > 0, iou, min_penalty)
    pair_mask = pred_mask[:, :, None] & gt_mask[:, None, :]
    loss = jnp.where(pair_mask, 1.0 - iou, 0.0)
    per_box = jnp.sum(loss, axis=-1) / jnp.maximum(jnp.sum(gt_mask, axis=-1)[:, None], 1)
    n_pred = jnp.sum(pred_mask, axis=-1)
    per_image = jnp.sum(jnp.where(pred_mask, per_box, 0.0), axis=-1) / \
        jnp.maximum(n_pred, 1)
    return jnp.where(n_pred > 0, per_image, no_box_penalty)
