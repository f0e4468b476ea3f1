"""Vectorized on-device sequence decoding.

The reference decodes generated sequences with per-sequence Python while-loops
(data_processing.py:556-598, 601-666, 669-716).  Those loops are
data-dependent and host-bound; here each becomes a fixed-shape ``lax.scan``
over token positions, vmapped over the batch, so box/label extraction runs
on-device inside jit and can feed the GIoU loss and mAP metrics without any
host synchronization.

Semantics are token-for-token identical to the reference's cursor walk:
  cursor starts after the first CAP_END (or 0 if absent);
  at a label token in [258, 267] with 4 following coords all in [0, 224],
  x2 > x1, y2 > y1: accept the group, advance cursor by 5
  (the cursor advances by 5 after a label token even when the coords are
  invalid, matching ``i += 5`` under the label branch);
  at EOS: stop;  otherwise advance by 1.

Parity with the host implementation is covered by tests/test_decode_jax.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mdcnet_tpu.config import (CAPTION_END_ID, CAPTION_START_ID, EOS_ID,
                               LABEL_END, LABEL_START, PAD_ID)

COORD_MAX = 224


class DecodedBoxes(NamedTuple):
    """Fixed-shape decoded detections for a batch.

    boxes:  (B, S, 4) float32 — bin units unless rescaled
    labels: (B, S)    int32   — -1 padding
    scores: (B, S)    float32 — -1 padding (only if scores were provided)
    count:  (B,)      int32   — number of valid groups per row
    """

    boxes: jnp.ndarray
    labels: jnp.ndarray
    scores: jnp.ndarray
    count: jnp.ndarray

    def valid_mask(self) -> jnp.ndarray:
        s = self.labels.shape[-1]
        return jnp.arange(s)[None, :] < self.count[:, None]


def first_index_of(seq: jnp.ndarray, token: int) -> jnp.ndarray:
    """Index of first occurrence of ``token`` in 1-D seq, or len(seq)."""
    hit = seq == token
    return jnp.where(jnp.any(hit), jnp.argmax(hit), seq.shape[0])


def _scan_groups_single(seq: jnp.ndarray, scores: jnp.ndarray,
                        max_groups: int) -> Tuple[jnp.ndarray, ...]:
    """Cursor-walk over one sequence. seq: (L,) int32, scores: (L,) f32."""
    length = seq.shape[0]
    eoc = first_index_of(seq, CAPTION_END_ID)
    start = jnp.where(eoc < length, eoc + 1, 0)

    boxes0 = jnp.zeros((max_groups, 4), jnp.float32)
    labels0 = jnp.full((max_groups,), -1, jnp.int32)
    scores0 = jnp.full((max_groups,), -1.0, jnp.float32)

    def body(carry, t):
        next_pos, stopped, count, boxes, labels, scs = carry
        token = seq[t]
        active = (t >= next_pos) & (~stopped) & (t < length - 4)
        # also handle EOS/cursor at tail positions >= length-4
        tail_active = (t >= next_pos) & (~stopped) & (t >= length - 4)

        is_label = (token >= LABEL_START) & (token <= LABEL_END)
        coords = jax.lax.dynamic_slice(seq, (jnp.minimum(t + 1, length - 4),),
                                       (4,))
        coords_ok = (jnp.all(coords >= 0) & jnp.all(coords <= COORD_MAX)
                     & (coords[2] > coords[0]) & (coords[3] > coords[1]))
        accept = active & is_label & coords_ok & (count < max_groups)

        slot = jnp.minimum(count, max_groups - 1)
        boxes = jnp.where(accept,
                          boxes.at[slot].set(coords.astype(jnp.float32)), boxes)
        labels = jnp.where(accept, labels.at[slot].set(token), labels)
        coord_scores = jax.lax.dynamic_slice(
            scores, (jnp.minimum(t + 1, length - 4),), (4,))
        scs = jnp.where(accept, scs.at[slot].set(coord_scores.mean()), scs)
        count = count + accept.astype(jnp.int32)

        is_eos = token == EOS_ID
        stopped = stopped | ((active | tail_active) & is_eos)
        step = jnp.where(active & is_label, 5, 1)
        next_pos = jnp.where(active | tail_active,
                             jnp.maximum(next_pos, t + step), next_pos)
        return (next_pos, stopped, count, boxes, labels, scs), None

    init = (start, jnp.array(False), jnp.array(0, jnp.int32),
            boxes0, labels0, scores0)
    (_, _, count, boxes, labels, scs), _ = jax.lax.scan(
        body, init, jnp.arange(length))
    return boxes, labels, scs, count


@functools.partial(jax.jit, static_argnames=("max_groups",))
def decode_groups(pred_seq: jnp.ndarray, pred_scores: Optional[jnp.ndarray] = None,
                  max_groups: int = 20) -> DecodedBoxes:
    """Vectorized equivalent of ``decode_bboxes_and_labels[_with_scores]``.

    pred_seq: (B, L) int32; pred_scores: (B, L) float32 or None.
    Boxes are returned in *bin* units like the reference
    (data_processing.py:669-716); use :func:`rescale_boxes` for pixel space.
    """
    pred_seq = pred_seq.astype(jnp.int32)
    if pred_scores is None:
        pred_scores = jnp.zeros(pred_seq.shape, jnp.float32)
    boxes, labels, scores, count = jax.vmap(
        lambda s, sc: _scan_groups_single(s, sc, max_groups)
    )(pred_seq, pred_scores.astype(jnp.float32))
    return DecodedBoxes(boxes, labels, scores, count)


def rescale_boxes(boxes: jnp.ndarray, num_bins: int, width: int,
                  height: int) -> jnp.ndarray:
    """Dequantize bin-unit boxes to pixel space (data_processing.py:547-554)."""
    scale = jnp.array([width, height, width, height], jnp.float32)
    return boxes.astype(jnp.float32) / (num_bins - 1) * scale


def decode_bboxes(pred_seq: jnp.ndarray, num_bins: int, width: int,
                  height: int, max_groups: int = 20
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized ``decode_bboxes`` (data_processing.py:556-598): pixel-space
    boxes with the reference's convention that a row with no valid boxes holds
    a single all-zero box.  Returns (boxes (B,S,4), mask (B,S))."""
    dec = decode_groups(pred_seq, max_groups=max_groups)
    boxes = rescale_boxes(dec.boxes, num_bins, width, height)
    mask = dec.valid_mask()
    boxes = jnp.where(mask[..., None], boxes, 0.0)
    return boxes, mask


@jax.jit
def decode_labels(tokens: jnp.ndarray) -> jnp.ndarray:
    """First label token in [258, 267] per row, PAD if none
    (data_processing.py:519-545)."""
    tokens = jnp.atleast_2d(tokens)
    in_window = (tokens >= LABEL_START) & (tokens <= LABEL_END)
    has = jnp.any(in_window, axis=-1)
    idx = jnp.argmax(in_window, axis=-1)
    first = jnp.take_along_axis(tokens, idx[:, None], axis=-1)[:, 0]
    return jnp.where(has, first, PAD_ID)


@jax.jit
def caption_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of caption positions: strictly between the first
    CAP_START and the first CAP_END, excluding PADs.  Vectorized form of
    ``decode_captions`` (data_processing.py:395-426) for per-row use."""
    tokens = jnp.atleast_2d(tokens)
    pos = jnp.arange(tokens.shape[-1])[None, :]
    soc = jax.vmap(lambda s: first_index_of(s, CAPTION_START_ID))(tokens)
    eoc = jax.vmap(lambda s: first_index_of(s, CAPTION_END_ID))(tokens)
    mask = (pos > soc[:, None]) & (pos < eoc[:, None]) & (tokens != PAD_ID)
    return mask


@jax.jit
def eos_structure_gate(batch_preds: jnp.ndarray) -> jnp.ndarray:
    """The ``(EOS_idx - 1) % 5 == 0`` sanity gate from postprocess
    (inference_p.py:94-97).  Returns per-row EOS index, 0 where the structure
    check fails (0 meaning: discard the row)."""
    hit = (batch_preds == EOS_ID).astype(jnp.float32)
    eos_idx = jnp.argmax(hit, axis=-1)
    valid = (eos_idx - 1) % 5 == 0
    return jnp.where(valid, eos_idx, 0)
