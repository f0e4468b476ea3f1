"""Reference-API compatibility facade.

One module mapping every public symbol of the reference repo onto this
framework's implementations, so users migrating from
``ashys2012/MDC-Net-...`` find the surface they know.  Each entry cites the
reference definition it mirrors.  New code should use the underlying modules
directly; this facade trades idiomatic naming for drop-in familiarity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --- allied_files.py -------------------------------------------------------
from mdcnet_tpu.core.debug import seed_everything            # allied_files.py:6-12
from mdcnet_tpu.evals.meters import AvgMeter                 # allied_files.py:75-90


def concat_gt(row):
    """allied_files.py:98-106: [label, xmin, ymin, xmax, ymax] from a row."""
    return [row["label"], row["xmin"], row["ymin"], row["xmax"], row["ymax"]]


# --- utils.py ---------------------------------------------------------------
from mdcnet_tpu.evals.bleu import calculate_bleu_scores      # utils.py:56-63
from mdcnet_tpu.ops.masks import causal_mask as _causal_mask


def generate_square_subsequent_mask(sz: int):
    """utils.py:7-12: (sz, sz) float causal mask, -inf above the diagonal."""
    return _causal_mask(sz)


def create_mask(tgt, pad_idx: int = 302):
    """utils.py:26-30: (causal mask, float pad mask)."""
    tgt = jnp.asarray(tgt)
    return _causal_mask(tgt.shape[1]), (tgt == pad_idx).astype(jnp.float32)


def get_lr(schedule_or_state, step=None):
    """utils.py:51-53 analogue: current LR from an optax schedule."""
    if callable(schedule_or_state):
        return float(schedule_or_state(step if step is not None else 0))
    raise TypeError("pass the optax schedule (mdcnet keeps LR functional)")


# --- dataset.py --------------------------------------------------------------
from mdcnet_tpu.data.annotations import txt_file_to_records


def txt_file_to_df(txt_file_path: str, image_folder: str):
    """dataset.py:31-86: returns a pandas DataFrame."""
    from mdcnet_tpu.data.annotations import to_dataframe
    return to_dataframe(txt_file_to_records(txt_file_path, image_folder,
                                            append_jpg=False))


def collate_fn(batch, max_len: int, pad_idx: int = 302):
    """dataset.py:123-135: (stacked images, right-padded sequence batch)."""
    images, seqs = [], []
    for sample in batch:
        image, s = sample[:2]
        flat = [t for sub in s for t in sub] if s and isinstance(s[0], list) else s
        images.append(np.asarray(image))
        seqs.append(np.asarray(flat, dtype=np.int64))
    width = max(len(s) for s in seqs)
    out = np.full((len(seqs), width), pad_idx, dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return np.stack(images), out


def get_transform_train(size: int):
    """dataset.py:91-104 equivalent: device-side train preprocess closure."""
    from mdcnet_tpu.data.augment import preprocess

    def apply(images, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return preprocess(jnp.asarray(images), rng, size, train=True)
    return apply


def get_transform_valid(size: int):
    """dataset.py:109-113 equivalent: resize+normalize only."""
    from mdcnet_tpu.data.augment import preprocess

    def apply(images, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return preprocess(jnp.asarray(images), rng, size, train=False)
    return apply


# --- data_processing.py ------------------------------------------------------
from mdcnet_tpu.text.vocabulary import Vocabulary            # data_processing.py:15-90
from mdcnet_tpu.text.tokenizer import SeqTokenizer as Tokenizer  # :224-783
from mdcnet_tpu.data.pipeline import (ImageOnlyDataset as VOCDatasetTest,
                                      SteelDefectDataset as VOCDataset,
                                      make_loaders)


def get_loaders(df_or_records, tokenizer, img_size, batch_size, max_len,
                pad_idx, num_workers=2, valid_size=0.19, test_size=0.01,
                synthetic_images=False):
    """data_processing.py:165-219: (train, valid, test) loaders."""
    import dataclasses
    from mdcnet_tpu.config import DataConfig
    records = df_or_records
    if hasattr(df_or_records, "columns"):  # pandas DataFrame
        records = {c: np.asarray(df_or_records[c]) for c in
                   df_or_records.columns}
    cfg = DataConfig(img_size=img_size, batch_size=batch_size,
                     max_len=max_len, valid_size=valid_size,
                     test_size=test_size)
    return make_loaders(records, tokenizer, cfg,
                        synthetic_images=synthetic_images)


def top_k_sampling(logits, k: int, rng=None):
    """data_processing.py:792-796 (functional: pass an rng key)."""
    from mdcnet_tpu.ops.sampling import top_k_sampling as _tks
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    return _tks(rng, jnp.asarray(logits), k)


def extract_tokens(pred_probs):
    """data_processing.py:798-805: argmax over the vocab dim."""
    return jnp.argmax(jnp.asarray(pred_probs), axis=-1)


def top_k_sampling_with_scores_2d(logits, k: int, rng=None):
    """data_processing.py:809-835: (sampled ids, their probabilities)."""
    from mdcnet_tpu.ops.sampling import top_k_sampling_with_scores
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    ids, scores = top_k_sampling_with_scores(rng, jnp.asarray(logits), k)
    return ids[..., None], scores[..., None]


# --- iou_calcualtions.py / iou_bbox.py ---------------------------------------
from mdcnet_tpu.ops.boxes import (pairwise_giou as giou_pairwise,
                                  pairwise_iou as bbox_iou)


def calculate_iou(box1, box2):
    """iou_bbox.py:3-43: pairwise IoU."""
    return bbox_iou(jnp.asarray(box1), jnp.asarray(box2))


def calculate_batch_iou(pred, gt):
    """iou_calcualtions.py:45-56: list of per-image NxM IoU matrices."""
    pred, gt = jnp.asarray(pred), jnp.asarray(gt)
    return [bbox_iou(pred[i], gt[i]) for i in range(pred.shape[0])]


def calculate_batch_max_iou(pred, gt):
    """iou_calcualtions.py:59-105: flat list of per-pred-box max IoUs,
    skipping images with no preds or no GTs."""
    out = []
    pred, gt = np.asarray(pred), np.asarray(gt)
    for i in range(pred.shape[0]):
        p = pred[i][np.any(pred[i] != 0, axis=-1)]
        g = gt[i][np.any(gt[i] != 0, axis=-1)]
        if len(p) and len(g):
            iou = np.asarray(bbox_iou(jnp.asarray(p), jnp.asarray(g)))
            out.extend(np.nan_to_num(iou.max(axis=1)).tolist())
    return out


calculate_batch_max_iou_torchvision = calculate_batch_max_iou


def giou_loss_with_scores(pred_boxes, gt_boxes, no_detection_penalty=1.0):
    """iou_calcualtions.py:165-208: (mean loss, per-image GIoU matrices).
    Zero rows are treated as padding, like the reference's filtering."""
    from mdcnet_tpu.ops import boxes as box_ops
    pred = jnp.asarray(pred_boxes, jnp.float32)
    gt = jnp.asarray(gt_boxes, jnp.float32)
    pred_mask = jnp.any(pred != 0, axis=-1)
    gt_mask = jnp.any(gt != 0, axis=-1)
    loss, giou = box_ops.giou_loss_with_scores(pred, pred_mask, gt, gt_mask,
                                               no_detection_penalty)
    return loss, giou


def iou_loss_individual(pred_boxes, gt_boxes, min_penalty=0.1,
                        no_box_penalty=1.0):
    """iou_bbox.py:85-114 / iou_calcualtions.py:259-288."""
    from mdcnet_tpu.ops import boxes as box_ops
    pred = jnp.atleast_3d(jnp.asarray(pred_boxes, jnp.float32))
    gt = jnp.atleast_3d(jnp.asarray(gt_boxes, jnp.float32))
    if pred.ndim == 3 and pred.shape[-1] != 4:
        pred = pred.reshape(1, -1, 4)
        gt = gt.reshape(1, -1, 4)
    pm = jnp.ones(pred.shape[:2], bool)
    gm = jnp.ones(gt.shape[:2], bool)
    return jnp.mean(box_ops.iou_loss_individual(pred, pm, gt, gm,
                                                min_penalty, no_box_penalty))


def iou_loss(pred_boxes, gt_boxes, min_penalty: float = 0.5):
    """iou_bbox.py:46-63: mean(1 - IoU) with zero-IoU pairs floored at
    ``min_penalty``."""
    iou = bbox_iou(jnp.asarray(pred_boxes, jnp.float32),
                   jnp.asarray(gt_boxes, jnp.float32))
    iou = jnp.where(iou > 0, iou, min_penalty)
    return jnp.mean(1.0 - iou)


def extract_predictions(logits, tokenizer):
    """iou_bbox.py:119-146: argmax over logits, per-sequence tokenizer
    decode -> (labels, bboxes, captions) lists."""
    tokens = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))
    labels, bboxes, captions = [], [], []
    for seq in tokens:
        l, b, c = tokenizer.decode(seq)
        labels.append(l)
        bboxes.append(b)
        captions.append(c)
    return labels, bboxes, captions


def extract_ground_truth(y, tokenizer, seq_len=None):
    """iou_bbox.py:149-175 (identical body to extract_predictions, applied
    to target ids; the reference passes a flattened batch)."""
    y = np.asarray(y)
    if y.ndim == 1 and seq_len:
        y = y.reshape(-1, seq_len)
    if y.ndim == 1:
        y = y[None]
    labels, bboxes, captions = [], [], []
    for seq in y:
        l, b, c = tokenizer.decode(seq)
        labels.append(l)
        bboxes.append(b)
        captions.append(c)
    return labels, bboxes, captions


def decode_bbox_from_pred(pred_seq, tokenizer):
    """iou_bbox.py:180-207: pixel-space boxes from one predicted sequence."""
    return tokenizer.decode_bboxes(np.asarray(pred_seq))


def extract_predicted_labels_with_logits(logits):
    """data_processing.py:721-756 intent: per sequence, the logits row at the
    first position whose argmax falls in the label window [258, 267]; rows
    with no such position are filled with PAD."""
    from mdcnet_tpu.config import LABEL_END, LABEL_START, PAD_ID
    logits = jnp.asarray(logits)
    ids = jnp.argmax(logits, axis=-1)
    in_window = (ids >= LABEL_START) & (ids <= LABEL_END)
    has = jnp.any(in_window, axis=-1)
    idx = jnp.argmax(in_window, axis=-1)
    rows = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
    return jnp.where(has[:, None], rows, float(PAD_ID))


# --- model.py / axial_model.py ----------------------------------------------
from mdcnet_tpu.models.vit import ViTEncoder as Encoder      # model.py:14-23
from mdcnet_tpu.models.decoder import CaptionDecoder as Decoder  # model.py:26-127
from mdcnet_tpu.models.encdec import EncoderDecoder          # model.py:147-181
from mdcnet_tpu.models.axial import (AxialAttention,          # axial_model.py:19-40
                                     AxialCaptionDecoder)

# --- inference scripts --------------------------------------------------------
from mdcnet_tpu.infer.generate import generate, postprocess  # inference_p.py:69-115
from mdcnet_tpu.infer.single import inference_single_image   # inference_code_craeted_me_gpt.py:46-65
from mdcnet_tpu.ops.sampling import top_k_top_p_filtering    # HF util used at inference_p.py:83

# --- utilities.py -------------------------------------------------------------
from mdcnet_tpu.utils.drawing import draw_bbox_with_caption, visualize


def append_df_to_csv(df, csv_path: str):
    """utilities.py:8-13: append with header iff the file is new."""
    import os
    df.to_csv(csv_path, mode="a", header=not os.path.exists(csv_path),
              index=False)


# --- check_it.py ---------------------------------------------------------------
def check_environment():
    """check_it.py equivalent: report framework/device versions."""
    import flax
    import optax
    info = {
        "jax": jax.__version__,
        "flax": flax.__version__,
        "optax": optax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    for k, v in info.items():
        print(f"{k}: {v}")
    return info
