"""Generation-based test epoch.

Reference ``test_epoch`` (train_val_epoch.py:727-887): runs the predict
path over the test loader, reports BLEU and IoU/GIoU on generated sequences,
and appends per-batch prediction rows (captions, boxes, classes) to a dated
CSV (utilities.py:8-13).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdcnet_tpu.data.augment import preprocess
from mdcnet_tpu.evals import MeanAveragePrecision, calculate_bleu_scores
from mdcnet_tpu.evals.meters import AvgMeter
from mdcnet_tpu.infer.generate import generate, postprocess
from mdcnet_tpu.ops import boxes as box_ops
from mdcnet_tpu.text import decode_jax
from mdcnet_tpu.utils.logging import CsvSink, dated_csv_path


def test_epoch(model, params, loader, tokenizer, cfg,
               save_dir: Optional[str] = None, logger=None,
               epoch_num: int = 0, rng: Optional[jax.Array] = None,
               class_metrics: bool = True) -> Dict[str, float]:
    """Generate on the test split; return BLEU / mean-max-IoU / GIoU-loss /
    mAP@0.3 (plus per-class mAP like valid_epoch_bbox's logging,
    train_val_epoch.py:657-665) and append prediction rows to a dated CSV."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    sink = CsvSink(dated_csv_path(save_dir, "test_predictions")) \
        if save_dir else None

    bleu_meter = AvgMeter("bleu")
    iou_meter = AvgMeter("iou")
    giou_meter = AvgMeter("giou_loss")
    exact_meter = AvgMeter("caption_exact_match")
    ungated_meter = AvgMeter("caption_exact_match_ungated")
    map_metric = MeanAveragePrecision(iou_threshold=0.3,
                                      class_metrics=class_metrics)

    for batch in loader:
        images = preprocess(jnp.asarray(batch.images), rng,
                            cfg.data.img_size, train=False)
        # conf_every=1 keeps every step's top-1 probability so detections
        # are score-ranked by mean coordinate-token probability like the
        # reference (data_processing.py:601-666 via train_val_epoch.py:172)
        res = generate(model, params, images, rng,
                       steps=cfg.infer.generation_steps,
                       top_k=cfg.infer.top_k, top_p=cfg.infer.top_p,
                       greedy=cfg.infer.greedy, conf_every=1)
        tokens = np.asarray(res.tokens)
        confs = np.asarray(res.confs)

        # box metrics on device; scores aligned token-for-token (BOS gets 1)
        scores_full = jnp.concatenate(
            [jnp.ones((tokens.shape[0], 1), jnp.float32), res.confs], axis=1)
        pred = decode_jax.decode_groups(res.tokens, pred_scores=scores_full,
                                        max_groups=8)
        gt = decode_jax.decode_groups(jnp.asarray(batch.tokens), max_groups=8)
        pb = decode_jax.rescale_boxes(pred.boxes, cfg.data.num_bins,
                                      cfg.data.img_size, cfg.data.img_size)
        gb = decode_jax.rescale_boxes(gt.boxes, cfg.data.num_bins,
                                      cfg.data.img_size, cfg.data.img_size)
        pm, gm = pred.valid_mask(), gt.valid_mask()
        giou_loss, _ = box_ops.giou_loss_with_scores(pb, pm, gb, gm)
        mean_iou = box_ops.mean_max_iou(pb, pm, gb, gm)
        n = tokens.shape[0]
        giou_meter.update(float(giou_loss), n)
        if np.isfinite(float(mean_iou)):
            iou_meter.update(float(mean_iou), n)

        # caption BLEU (token-level, like train_val_epoch.py:90-98)
        for i in range(n):
            ref = tokenizer.decode_captions(batch.tokens[i]).tolist()
            hyp = tokenizer.decode_captions(tokens[i]).tolist()
            bleu_meter.update(calculate_bleu_scores([ref], [hyp])[0])

        # mAP accumulation
        for i in range(n):
            n_p, n_g = int(pred.count[i]), int(gt.count[i])
            map_metric.update(
                [{"boxes": np.asarray(pb[i][:n_p]),
                  "scores": np.asarray(pred.scores[i][:n_p]),
                  "labels": np.asarray(pred.labels[i][:n_p])}],
                [{"boxes": np.asarray(gb[i][:n_g]),
                  "labels": np.asarray(gt.labels[i][:n_g])}])

        # caption exact-match (the BASELINE quality gate: generated caption
        # string equals the GT caption under the reference decode rules).
        # NB the reference's postprocess EOS gate `(EOS_idx-1)%5 != 0`
        # (inference_trail_after_good_map.py:51-53) nulls every sequence
        # whose caption has a ONE-word position phrase ("center"/"left"/...,
        # 64% of GC10 captions — their EOS lands at the wrong residue), so
        # this gated metric is structurally capped near 0.37 no matter how
        # good the model is.  `caption_exact_match_ungated` below measures
        # the same string equality on a plain EOS-truncated decode.
        bboxes, labels, captions, cfs = postprocess(tokens, confs, tokenizer)
        gt_decoded = [tokenizer.decode(batch.tokens[i]) for i in range(n)]
        for i in range(n):
            gt_caption = gt_decoded[i][2]
            exact_meter.update(float(captions[i] == gt_caption))
            ungated_meter.update(
                float(tokenizer.decode(tokens[i])[2] == gt_caption))

        # prediction log rows (train_val_epoch.py:836-854)
        if sink is not None:
            for i in range(n):
                _, gt_boxes_i, gt_caption = gt_decoded[i]
                sink.log({
                    "epoch": epoch_num,
                    "pred_caption": captions[i],
                    "gt_caption": gt_caption,
                    "pred_boxes": bboxes[i],
                    "gt_boxes": gt_boxes_i,
                    "pred_labels": labels[i],
                    "confs": cfs[i],
                })

    scores = map_metric.compute()
    out = {"test/bleu": bleu_meter.avg, "test/mean_max_iou": iou_meter.avg,
           "test/giou_loss": giou_meter.avg,
           "test/caption_exact_match": exact_meter.avg,
           "test/caption_exact_match_ungated": ungated_meter.avg,
           "test/map@0.3": scores["map"]}
    if class_metrics:
        for cls, ap in scores.get("map_per_class", {}).items():
            out[f"test/map@0.3/class_{cls}"] = ap
    if logger is not None:
        logger.log(out, step=epoch_num)
    return out
