"""Box-metric kernels vs the reference formulas (iou_calcualtions.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.ops import boxes as box_ops


def ref_pairwise_iou(b1, b2):
    """Direct numpy port of bbox_iou semantics (iou_calcualtions.py:5-40)."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    ixmin = np.maximum(b1[:, None, 0], b2[:, 0])
    iymin = np.maximum(b1[:, None, 1], b2[:, 1])
    ixmax = np.minimum(b1[:, None, 2], b2[:, 2])
    iymax = np.minimum(b1[:, None, 3], b2[:, 3])
    inter = np.clip(ixmax - ixmin, 0, None) * np.clip(iymax - iymin, 0, None)
    union = area1[:, None] + area2 - inter
    return inter / (union + 1e-6)


def ref_pairwise_giou(pred, gt):
    """numpy port of giou_pairwise (iou_calcualtions.py:220-255)."""
    max_xy = np.minimum(pred[:, None, 2:], gt[:, 2:])
    min_xy = np.maximum(pred[:, None, :2], gt[:, :2])
    inter = np.clip(max_xy - min_xy, 0, None)
    intersection = inter[:, :, 0] * inter[:, :, 1]
    pa = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
    ga = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = pa[:, None] + ga[None, :] - intersection
    emax = np.maximum(pred[:, None, 2:], gt[:, 2:])
    emin = np.minimum(pred[:, None, :2], gt[:, :2])
    enc = (emax - emin)
    enc_area = enc[:, :, 0] * enc[:, :, 1]
    iou = intersection / union
    return iou - (enc_area - union) / enc_area


def random_boxes(rng, n):
    xy = rng.uniform(0, 180, size=(n, 2))
    wh = rng.uniform(5, 44, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestPairwise:
    def test_iou_matches_reference(self, rng):
        a, b = random_boxes(rng, 6), random_boxes(rng, 4)
        got = np.asarray(box_ops.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref_pairwise_iou(a, b), rtol=1e-5)

    def test_giou_matches_reference(self, rng):
        a, b = random_boxes(rng, 5), random_boxes(rng, 3)
        got = np.asarray(box_ops.pairwise_giou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref_pairwise_giou(a, b), rtol=1e-4,
                                   atol=1e-5)

    def test_giou_range(self, rng):
        a, b = random_boxes(rng, 8), random_boxes(rng, 8)
        g = np.asarray(box_ops.pairwise_giou(jnp.asarray(a), jnp.asarray(b)))
        assert np.all(g <= 1.0 + 1e-6) and np.all(g >= -1.0 - 1e-6)

    def test_identical_boxes_iou_one(self):
        b = jnp.asarray([[10.0, 10, 50, 50]])
        np.testing.assert_allclose(
            np.asarray(box_ops.pairwise_iou(b, b)), [[1.0]], atol=1e-4)


class TestBatched:
    def test_giou_loss_matches_reference_loop(self, rng):
        """Masked batch kernel == reference per-image loop
        (iou_calcualtions.py:165-208)."""
        B, N, M = 4, 3, 2
        pred = np.stack([random_boxes(rng, N) for _ in range(B)])
        gt = np.stack([random_boxes(rng, M) for _ in range(B)])
        pred_mask = rng.random((B, N)) > 0.3
        gt_mask = rng.random((B, M)) > 0.2
        pred_mask[0] = False  # image with no predictions
        gt_mask[1] = False    # image with no GT

        # reference loop
        per_image = []
        for i in range(B):
            p = pred[i][pred_mask[i]]
            g = gt[i][gt_mask[i]]
            if len(p) == 0 and len(g) > 0:
                per_image.append(1.0 * len(g))
            elif len(p) == 0 or len(g) == 0:
                per_image.append(0.0)
            else:
                per_image.append(1.0 - ref_pairwise_giou(p, g).mean())
        want = np.mean(per_image)

        got, _ = box_ops.giou_loss_with_scores(
            jnp.asarray(pred), jnp.asarray(pred_mask),
            jnp.asarray(gt), jnp.asarray(gt_mask))
        np.testing.assert_allclose(float(got), want, rtol=1e-4)

    def test_mean_max_iou_matches_reference_loop(self, rng):
        B, N, M = 3, 4, 3
        pred = np.stack([random_boxes(rng, N) for _ in range(B)])
        gt = np.stack([random_boxes(rng, M) for _ in range(B)])
        pred_mask = np.ones((B, N), bool)
        gt_mask = np.ones((B, M), bool)
        gt_mask[2] = False  # no GT -> that image skipped entirely

        max_ious = []
        for i in range(B):
            if gt_mask[i].any():
                iou = ref_pairwise_iou(pred[i], gt[i][gt_mask[i]])
                max_ious.extend(iou.max(axis=1).tolist())
        want = np.mean(max_ious)

        got = box_ops.mean_max_iou(jnp.asarray(pred), jnp.asarray(pred_mask),
                                   jnp.asarray(gt), jnp.asarray(gt_mask))
        np.testing.assert_allclose(float(got), want, rtol=1e-4)
