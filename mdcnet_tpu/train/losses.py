"""Training losses.

The reference composite (train_val_epoch.py:353-365):
  total = (1 - iou_w) * CE(ignore PAD) + l1_lambda * sum|params| + iou_w * GIoU

where the GIoU term is computed from boxes decoded out of *top-k sampled
integer tokens* (train_val_epoch.py:81,158,289) and therefore carries no
gradient.  ``composite_loss`` replicates that by default
(``replicate_nondiff_giou=True`` -> GIoU enters via stop_gradient so the loss
*value* matches but, exactly like the reference, only CE+L1 produce grads).
With the flag off, a differentiable expected-coordinate GIoU is used: box
coordinates are decoded as softmax-expectations over the coordinate token
window, giving real gradients through the box head.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mdcnet_tpu.config import PAD_ID
from mdcnet_tpu.ops import boxes as box_ops


def cross_entropy_ignore_pad(logits: jnp.ndarray, targets: jnp.ndarray,
                             pad_id: int = PAD_ID) -> jnp.ndarray:
    """Mean token CE over non-pad targets (torch CrossEntropyLoss with
    ignore_index, trail_01.py:229). logits: (B, L, V), targets: (B, L)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def coord_smoothed_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                                 num_bins: int, sigma: float,
                                 pad_id: int = PAD_ID) -> jnp.ndarray:
    """CE where coordinate-token targets are a discretized Gaussian over
    neighboring bins instead of one-hot.

    The vocabulary's coordinate window is ids [0, num_bins); those classes
    are ORDINAL (bin j is a pixel position), but plain CE treats a miss by
    one bin exactly like a miss by 200.  Round-3 diagnosis: after full
    convergence under one-hot CE the coordinate positions sit at 21 % token
    accuracy with |err| p50 = 28 bins while label/special positions are at
    93 %+ — the one-hot objective never teaches the ordinal structure.
    A Gaussian soft target (sigma ~1-2 bins) rewards near-misses and
    concentrates mass around the true bin; non-coordinate targets stay
    one-hot.  ``sigma=0`` is exactly ``cross_entropy_ignore_pad``.
    """
    if sigma <= 0:
        return cross_entropy_ignore_pad(logits, targets, pad_id)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot part (all tokens)
    nll_hard = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    # Gaussian part over the coordinate window.  Targets outside the
    # window are clamped to bin 0 FIRST: for a far-away target (e.g. a
    # special token ~300) every Gaussian weight underflows to zero and the
    # w/sum(w) normalization is 0/0 — the NaN then leaks through the
    # jnp.where into the gradient even though the branch is unselected
    # (the standard where-NaN-grad trap).
    is_coord = targets < num_bins
    t_c = jnp.where(is_coord, targets, 0).astype(jnp.float32)
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    d2 = (bins[None, None, :] - t_c[..., None]) ** 2
    w = jnp.exp(-d2 / (2.0 * sigma * sigma))
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    nll_soft = -jnp.sum(w * logp[..., :num_bins], axis=-1)
    nll = jnp.where(is_coord, nll_soft, nll_hard)
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l1_regularization(params) -> jnp.ndarray:
    """sum(|p|) over every parameter (train_val_epoch.py:361)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.abs(p.astype(jnp.float32))) for p in leaves)


def expected_boxes(logits: jnp.ndarray, label_positions: jnp.ndarray,
                   num_bins: int) -> jnp.ndarray:
    """Differentiable box decode: softmax-expected coordinate over the token
    window [0, num_bins) at the 4 positions following each label position.

    logits: (B, L, V); label_positions: (B,) index of the label token's
    *logit* position.  Returns (B, 4) expected coordinates in bin units.
    """
    coord_logits = jax.vmap(
        lambda lg, p: jax.lax.dynamic_slice(lg, (p + 1, 0), (4, lg.shape[1]))
    )(logits, label_positions)
    window = coord_logits[..., :num_bins].astype(jnp.float32)
    probs = jax.nn.softmax(window, axis=-1)
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    return jnp.einsum("bcv,v->bc", probs, bins)


def differentiable_giou_loss(logits: jnp.ndarray, y_expected: jnp.ndarray,
                             num_bins: int, width: int,
                             height: int) -> jnp.ndarray:
    """Fully differentiable GIoU: predicted boxes are softmax-expected
    coordinates at the positions the GT structure dictates (teacher forcing
    makes GT and logit positions coincide); GT boxes come from the GT
    coordinate tokens.  The fix-behind-a-flag for the reference's
    non-differentiable sampled-token GIoU (SURVEY §7 hard parts).

    Label anchoring: the caption CONTAINS the defect-class word, which the
    reference vocabulary encodes with the SAME id as the label token
    (data_processing.py:17-33 — class words are predefined ids 258-267), so
    the label slot is the first in-window token AFTER the first CAP_END,
    exactly like the reference's decode cursor (data_processing.py:556-598,
    mirrored in text/decode_jax.decode_groups).  Anchoring on the first
    in-window token anywhere silently reads caption-word positions and the
    loss degenerates to a constant ~1.33 (round-3 bug: it froze every
    --diff-giou run's GIoU while CE kept converging)."""
    from mdcnet_tpu.config import CAPTION_END_ID, LABEL_END, LABEL_START

    L = y_expected.shape[1]
    pos = jnp.arange(L)[None, :]
    cap_end = y_expected == CAPTION_END_ID
    # caption-less sequences (NEU-style label-first) have no CAP_END: treat
    # the caption as ending before position 0 so the whole row is searched
    eoc = jnp.where(jnp.any(cap_end, axis=-1), jnp.argmax(cap_end, axis=-1),
                    -1)
    in_window = ((y_expected >= LABEL_START) & (y_expected <= LABEL_END)
                 & (pos > eoc[:, None]))
    has_label = jnp.any(in_window, axis=-1)
    label_pos = jnp.argmax(in_window, axis=-1)

    pred = expected_boxes(logits, label_pos, num_bins)          # (B, 4) bins
    gt = jax.vmap(lambda y, p: jax.lax.dynamic_slice(y, (p + 1,), (4,))
                  )(y_expected, label_pos).astype(jnp.float32)

    scale = jnp.array([width, height, width, height], jnp.float32)
    scale = scale / (num_bins - 1)
    pred = pred * scale
    gt = gt * scale
    # order the predicted corners: the four expected coordinates are
    # independent, and an inverted box (x1 < x0) makes pairwise_giou's
    # union/IoU unbounded (the round-3 --diff-giou divergence).  min/max is
    # differentiable a.e. and keeps GIoU in [-1, 1].
    pred = jnp.concatenate([jnp.minimum(pred[:, :2], pred[:, 2:]),
                            jnp.maximum(pred[:, :2], pred[:, 2:])], axis=-1)
    giou = box_ops.pairwise_giou(pred[:, None, :], gt[:, None, :])[:, 0, 0]
    per_image = jnp.where(has_label, 1.0 - giou, 0.0)
    n = jnp.maximum(jnp.sum(has_label), 1)
    return jnp.sum(per_image) / n


def composite_loss(logits: jnp.ndarray, targets: jnp.ndarray, params,
                   giou_loss_value: jnp.ndarray,
                   iou_loss_weight: float = 0.5,
                   l1_lambda: float = 1e-7,
                   replicate_nondiff_giou: bool = True,
                   coord_sigma: float = 0.0, num_bins: int = 0
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The reference total loss (train_val_epoch.py:364-365).  With
    ``coord_sigma > 0`` the CE term uses Gaussian-smoothed coordinate
    targets (``coord_smoothed_cross_entropy``)."""
    if coord_sigma > 0:
        ce = coord_smoothed_cross_entropy(logits, targets, num_bins,
                                          coord_sigma)
    else:
        ce = cross_entropy_ignore_pad(logits, targets)
    l1 = l1_regularization(params)
    giou = (jax.lax.stop_gradient(giou_loss_value)
            if replicate_nondiff_giou else giou_loss_value)
    total = (1.0 - iou_loss_weight) * ce + l1_lambda * l1 + \
        iou_loss_weight * giou
    return total, {"ce_loss": ce, "l1_norm": l1, "giou_loss": giou,
                   "total_loss": total}
