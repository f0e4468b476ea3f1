"""Jitted train/eval steps.

One fused XLA program per step: forward (teacher-forced, patch dropout),
top-k sampling of predicted sequences, on-device box decode (lax.scan), GIoU
loss, composite loss, backward, AdamW update — no host round-trips.  The
reference runs the same logic as ~15 separate host-synced stages per batch
(train_val_epoch.py:50-384, SURVEY §3.2).

Target alignment (cfg.train.aligned_targets):
  The reference slices ``y_input = y[:, :-1]`` while its sequences already
  START with BOS and its forward prepends ANOTHER BOS
  (data_processing.py:273, model.py:60-61, train_val_epoch.py:52-59) —
  output position j last sees y[j-1] but is paired with target y[j+1], so
  teacher forcing trains a skip-one predictor; autoregressive generation
  under any consistent convention then emits every other token unless the
  model falls back to position-keyed addressing.  With
  ``aligned_targets=True`` (default) the duplicate BOS is dropped:
  ``y_input = y[:, 1:-1]`` (forward still prepends BOS), logits are NOT
  shifted, and position j (last sees y[j]) predicts y[j+1] — the
  convention the generation paths already implement.
  ``aligned_targets=False`` replicates the reference bit-for-bit
  (docs/PARITY.md divergence 9).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mdcnet_tpu.ops import boxes as box_ops
from mdcnet_tpu.ops.sampling import top_k_sampling_with_scores
from mdcnet_tpu.text import decode_jax
from mdcnet_tpu.train import losses
from mdcnet_tpu.train.state import TrainState, make_optimizer

MAX_BOXES = 8  # decode slots per sequence; GC10 images carry <= 5 boxes


def _box_metrics(sampled: jnp.ndarray, sampled_scores: jnp.ndarray,
                 y_expected: jnp.ndarray, num_bins: int, width: int,
                 height: int) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Decode sampled + GT sequences on device, return (giou_loss, metrics).

    Box decode follows train_val_epoch.py:158-289: predicted boxes come from
    top-k sampled tokens, GT boxes from y_expected, both through the
    pixel-space rescale; GIoU loss uses the no-detection penalty variant.
    """
    pred = decode_jax.decode_groups(sampled, sampled_scores,
                                    max_groups=MAX_BOXES)
    gt = decode_jax.decode_groups(y_expected, max_groups=MAX_BOXES)

    pred_boxes = decode_jax.rescale_boxes(pred.boxes, num_bins, width, height)
    gt_boxes = decode_jax.rescale_boxes(gt.boxes, num_bins, width, height)
    pred_mask = pred.valid_mask()
    gt_mask = gt.valid_mask()

    giou_loss, _ = box_ops.giou_loss_with_scores(
        pred_boxes, pred_mask, gt_boxes, gt_mask)
    mean_iou = box_ops.mean_max_iou(pred_boxes, pred_mask, gt_boxes, gt_mask)
    n_pred = jnp.sum(pred_mask)
    decoded = {"pred_boxes": pred_boxes, "pred_labels": pred.labels,
               "pred_scores": pred.scores, "pred_count": pred.count,
               "gt_boxes": gt_boxes, "gt_labels": gt.labels,
               "gt_count": gt.count}
    return giou_loss, {"mean_max_iou": mean_iou,
                       "num_pred_boxes": n_pred.astype(jnp.float32)}, decoded


def make_train_step(model, cfg, apply_fn=None):
    """Build the jitted train step for a model + config.

    ``apply_fn`` overrides ``model.apply`` for the forward — e.g. the
    context-parallel apply (parallel/streaming.make_context_parallel_apply)
    that shards the encoder sequence over the mesh ``context`` axis for 512²
    training.  Same signature as model.apply.
    """
    model_apply = apply_fn if apply_fn is not None else model.apply
    aligned = getattr(cfg.train, "aligned_targets", True)
    tx = make_optimizer(cfg.train)
    num_bins = cfg.data.num_bins
    width = height = cfg.data.img_size
    iou_w = cfg.train.iou_loss_weight
    l1_lambda = cfg.train.l1_lambda
    replicate = cfg.train.replicate_nondiff_giou
    coord_sigma = getattr(cfg.train, "coord_label_smooth_sigma", 0.0)

    def loss_fn(params, images, y, rngs):
        y_input = y[:, 1:-1] if aligned else y[:, :-1]
        y_expected = y[:, 1:]
        logits = model_apply({"params": params}, images, y_input,
                             deterministic=False, rngs=rngs)
        if not aligned:
            logits = logits[:, :-1]  # drop final step (train_val_epoch.py:59)

        # top-k sample the predicted sequence for box decode
        # (train_val_epoch.py:172-179 uses k=10 with scores)
        sampled, scores = top_k_sampling_with_scores(
            rngs["sampling"], logits, k=10)
        giou_loss, box_metrics, _ = _box_metrics(
            sampled, scores, y_expected, num_bins, width, height)

        if not replicate:
            # the fixed (differentiable) box loss: expected-coordinate GIoU
            # against the GT structure; the sampled-token GIoU stays a metric
            giou_loss = losses.differentiable_giou_loss(
                logits, y_expected, num_bins, width, height)

        total, metrics = losses.composite_loss(
            logits, y_expected, params, giou_loss, iou_loss_weight=iou_w,
            l1_lambda=l1_lambda, replicate_nondiff_giou=replicate,
            coord_sigma=coord_sigma, num_bins=num_bins)
        metrics.update(box_metrics)
        return total, metrics

    accum = max(1, getattr(cfg.train, "grad_accum_steps", 1))

    @jax.jit
    def train_step(state: TrainState, images: jnp.ndarray, y: jnp.ndarray
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One optimizer step.  With cfg.train.grad_accum_steps > 1 the
        batch is split into that many micro-batches along axis 0 and
        gradients are averaged over a lax.scan before the single optimizer
        update (effective batch = full input batch, activation memory =
        one micro-batch)."""
        rngs, next_rng = state.next_rngs("dropout", "patch_dropout", "sampling")
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum == 1:
            (_, metrics), grads = grad_fn(state.params["params"], images, y,
                                          rngs)
        else:
            b = images.shape[0]
            mb = b // accum
            assert mb * accum == b, (b, accum)
            im_mb = images[:mb * accum].reshape((accum, mb) + images.shape[1:])
            y_mb = y[:mb * accum].reshape((accum, mb) + y.shape[1:])

            def micro(carry, xs):
                grads_acc, i = carry
                im_i, y_i = xs
                sub = {k: jax.random.fold_in(v, i) for k, v in rngs.items()}
                (_, m), g = grad_fn(state.params["params"], im_i, y_i, sub)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                return (grads_acc, i + 1), m

            zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                           state.params["params"])
            (grads, _), ms = jax.lax.scan(micro, (zeros, 0), (im_mb, y_mb))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), ms)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params["params"])
        params = optax.apply_updates(state.params["params"], updates)
        new_state = TrainState(params={"params": params}, opt_state=opt_state,
                               step=state.step + 1, rng=state.rng)
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, images: jnp.ndarray, y: jnp.ndarray
                  ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Validation step (valid_epoch_bbox, train_val_epoch.py:436-723):
        same metric battery, deterministic forward, argmax sampling.

        Returns (metrics, aux): scalar metrics plus the device-side decode
        products (sampled tokens, pred/gt boxes+labels+counts) the epoch
        driver needs for the reference's validation BLEU and per-epoch /
        per-class mAP (train_val_epoch.py:477-518,630-665).
        """
        y_input = y[:, 1:-1] if aligned else y[:, :-1]
        y_expected = y[:, 1:]
        logits = model_apply(state.params, images, y_input,
                             deterministic=True)
        if not aligned:
            logits = logits[:, :-1]
        sampled = jnp.argmax(logits, axis=-1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        scores = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        giou_loss, box_metrics, decoded = _box_metrics(
            sampled, scores, y_expected, num_bins, width, height)
        total, metrics = losses.composite_loss(
            logits, y_expected, state.params["params"], giou_loss,
            iou_loss_weight=iou_w, l1_lambda=l1_lambda,
            replicate_nondiff_giou=True)
        metrics.update(box_metrics)
        aux = dict(decoded, sampled=sampled, gt_tokens=y_expected)
        return metrics, aux

    return train_step, eval_step
