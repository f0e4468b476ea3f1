"""Pix2Seq sequence tokenizer: build and decode flat token sequences.

Sequence format (data_processing.py:264-290):
  [BOS=300, CAP_START=303, caption word ids..., CAP_END=304,
   label (258-267), x0_q, y0_q, x1_q, y1_q, EOS=301]  truncated to max_len

Coordinates are normalized to [0, 1] by image width/height and quantized to
``num_bins - 1`` integer bins with truncation toward zero
(data_processing.py:252-262).

Decode rules reproduced exactly (data_processing.py:317-716):
  - strip PAD tokens, truncate at first EOS
  - caption = tokens strictly between first CAP_START and first CAP_END
  - box groups are scanned after CAP_END: a label token in [258, 267] followed
    by 4 coords all in [0, 224] with x2 > x1 and y2 > y1 is accepted, the
    cursor advances by 5; EOS stops the scan; anything else advances by 1
  - accepted coords are dequantized (x / (num_bins-1)) and scaled back to
    width/height

This module is host-side (pure Python/NumPy).  The vectorized on-device decode
kernels live in :mod:`mdcnet_tpu.text.decode_jax`.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, CAPTION_START_ID,
                               CODE_VOCAB_SIZE, EOS_ID, LABEL_END, LABEL_START,
                               PAD_ID)
from mdcnet_tpu.text.vocabulary import Vocabulary

# Reference decode functions hardcode the coordinate validity window to
# [0, 224] independent of num_bins (data_processing.py:371,580).
COORD_MAX = 224


class SeqTokenizer:
    """Builds and decodes the flat caption+label+bbox token sequences."""

    BOS_code = BOS_ID
    EOS_code = EOS_ID
    PAD_code = PAD_ID
    CAPTION_START = CAPTION_START_ID
    CAPTION_END = CAPTION_END_ID
    vocab_size = CODE_VOCAB_SIZE

    def __init__(self, vocab: Vocabulary, num_classes: int, num_bins: int,
                 width: int, height: int, max_len: int = 200,
                 caption_length: int = 40):
        self.vocab = vocab
        self.num_classes = num_classes
        self.num_bins = num_bins
        self.width = width
        self.height = height
        self.max_len = max_len
        self.caption_length = caption_length

    # -- quantization (data_processing.py:252-262) --------------------------
    def quantize(self, x: np.ndarray) -> np.ndarray:
        """x in [0, 1] -> integer bin in [0, num_bins-1] (truncating)."""
        return (np.asarray(x) * (self.num_bins - 1)).astype("int")

    def dequantize(self, x: np.ndarray) -> np.ndarray:
        """integer bin -> float in [0, 1]."""
        return np.asarray(x).astype("float32") / (self.num_bins - 1)

    # -- sequence construction (data_processing.py:264-300) -----------------
    def process_single_pair(self, label: int, bbox: Sequence[float],
                            caption: str) -> List[int]:
        bbox = np.array(bbox, dtype=float)
        bbox[0] /= self.width
        bbox[2] /= self.width
        bbox[1] /= self.height
        bbox[3] /= self.height

        tokens = [self.BOS_code, self.CAPTION_START]
        tokens.extend(self.vocab.numericalize(caption))
        tokens.append(self.CAPTION_END)
        tokens.append(int(label))
        tokens.extend(int(q) for q in self.quantize(bbox))
        tokens.append(self.EOS_code)
        return tokens[: self.max_len]

    def __call__(self, labels: Sequence[int], bboxes: Sequence[Sequence[float]],
                 captions: Sequence[str]) -> List[List[int]]:
        assert len(captions) == len(bboxes) == len(labels), (
            "Each bbox must have a corresponding label and caption")
        return [self.process_single_pair(l, b, c)
                for l, b, c in zip(labels, bboxes, captions)]

    def get_spacy_vocab_size(self) -> int:
        return len(self.vocab)

    def get_complete_vocab_size(self) -> int:
        return self.vocab_size

    @property
    def total_vocab_size(self) -> int:
        """Decoder vocab size: word vocab + code vocab (trail_01.py:108-115)."""
        return len(self.vocab) + self.vocab_size

    # -- decode helpers ------------------------------------------------------
    def _clean(self, tokens) -> np.ndarray:
        tokens = np.asarray(tokens).reshape(-1)
        tokens = tokens[tokens != self.PAD_code]
        eos = np.flatnonzero(tokens == self.EOS_code)
        if eos.size > 0:
            tokens = tokens[: eos[0]]
        return tokens

    def _scan_box_groups(self, seq: np.ndarray, start_idx: int):
        """The shared label+bbox scanning loop (data_processing.py:575-586)."""
        groups = []  # (label, bbox[4], start position)
        i = start_idx
        n = len(seq)
        while i < n - 4:
            token = int(seq[i])
            if LABEL_START <= token <= LABEL_END:
                bbox = seq[i + 1: i + 5]
                if (np.all(bbox >= 0) and np.all(bbox <= COORD_MAX)
                        and bbox[2] > bbox[0] and bbox[3] > bbox[1]):
                    groups.append((token, [int(b) for b in bbox], i))
                i += 5
            elif token == self.EOS_code:
                break
            else:
                i += 1
        return groups

    def _rescale(self, boxes: np.ndarray) -> np.ndarray:
        """Dequantize bins and scale to pixel space (data_processing.py:547-554)."""
        out = self.dequantize(boxes).astype("float64")
        out[..., [0, 2]] *= self.width
        out[..., [1, 3]] *= self.height
        return out

    # -- decode family (data_processing.py:317-716) --------------------------
    def decode(self, tokens) -> Tuple[List[int], List[List[float]], str]:
        """Full decode: (labels, bboxes in pixel space, caption text).

        Reference: data_processing.py:317-391.
        """
        tokens = np.asarray(tokens).reshape(-1)
        if tokens.size == 0:
            return [], [], ""
        tokens = self._clean(tokens)

        labels: List[int] = []
        bboxes: List[List[int]] = []
        caption_text = ""

        soc = np.flatnonzero(tokens == self.CAPTION_START)
        eoc = np.flatnonzero(tokens == self.CAPTION_END)
        if soc.size > 0 and eoc.size > 0:
            soc_idx, eoc_idx = int(soc[0]), int(eoc[0])
            caption_ids = tokens[soc_idx + 1: eoc_idx].tolist()
            texts = self.tokens_to_text(caption_ids)
            caption_text = texts if isinstance(texts, str) else " ".join(texts)
            # The reference scans [eoc+1:] in strict groups of 5 here
            # (data_processing.py:365-377), unlike the cursor-walk used by
            # decode_bboxes.  Reproduce the strict stride-5 variant.
            tail = tokens[eoc_idx + 1:]
            for i in range(0, len(tail), 5):
                if i + 4 < len(tail):
                    label = int(tail[i])
                    bbox = tail[i + 1: i + 5]
                    if (LABEL_START <= label <= LABEL_END
                            and np.all(bbox >= 0) and np.all(bbox <= COORD_MAX)):
                        labels.append(label)
                        bboxes.append([int(b) for b in bbox])

        boxes = np.array(bboxes, dtype=float)
        if boxes.size > 0:
            boxes = self._rescale(boxes)
        return labels, boxes.tolist(), caption_text

    def decode_captions(self, tokens) -> np.ndarray:
        """Strip PAD, cut at first CAP_END, then drop through first CAP_START.

        Works on a flat sequence like the reference
        (data_processing.py:395-426 operates on the flattened tensor).
        """
        tokens = np.asarray(tokens).reshape(-1)
        if tokens.size == 0:
            return tokens
        tokens = tokens[tokens != self.PAD_code]
        eoc = np.flatnonzero(tokens == self.CAPTION_END)
        if eoc.size > 0:
            tokens = tokens[: eoc[0]]
        soc = np.flatnonzero(tokens == self.CAPTION_START)
        if soc.size > 0:
            tokens = tokens[soc[0] + 1:]
        return tokens

    def decode_labels(self, tokens) -> np.ndarray:
        """First in-window label token per sequence, PAD if none
        (data_processing.py:519-545)."""
        tokens = np.asarray(tokens)
        if tokens.size == 0:
            return np.array([], dtype=np.int64)
        if tokens.ndim == 1:
            tokens = tokens[None, :]
        out = []
        for row in tokens:
            in_window = row[(row >= LABEL_START) & (row <= LABEL_END)]
            out.append(int(in_window[0]) if in_window.size > 0 else self.PAD_code)
        return np.array(out, dtype=np.int64)

    def decode_bboxes(self, pred_seq) -> np.ndarray:
        """Per-sequence cursor-walk box decode, rescaled to pixel space, padded
        to the max box count in the batch (data_processing.py:556-598).
        Sequences with no valid boxes contribute one all-zero box."""
        pred_seq = np.asarray(pred_seq)
        if pred_seq.size == 0:
            return np.zeros((0, 1, 4), dtype=np.float32)
        if pred_seq.ndim == 1:
            pred_seq = pred_seq[None, :]

        per_seq: List[np.ndarray] = []
        for seq in pred_seq:
            eoc = np.flatnonzero(seq == self.CAPTION_END)
            start = int(eoc[0]) + 1 if eoc.size > 0 else 0
            groups = self._scan_box_groups(seq, start)
            if groups:
                boxes = np.array([g[1] for g in groups], dtype=float)
                per_seq.append(self._rescale(boxes))
            else:
                per_seq.append(np.zeros((1, 4)))

        max_n = max(b.shape[0] for b in per_seq)
        out = np.zeros((len(per_seq), max_n, 4), dtype=np.float32)
        for i, b in enumerate(per_seq):
            out[i, : b.shape[0]] = b
        return out

    def decode_bboxes_and_labels(self, pred_seq):
        """Like decode_bboxes but also returns labels; boxes stay in *bin*
        units, labels padded with -1 (data_processing.py:669-716)."""
        boxes, labels, _ = self._decode_groups(pred_seq, scores=None)
        return boxes, labels

    def decode_bboxes_and_labels_with_scores(self, pred_seq, pred_scores):
        """Adds per-box scores = mean of the 4 coord probabilities
        (data_processing.py:601-666)."""
        return self._decode_groups(pred_seq, scores=np.asarray(pred_scores))

    def _decode_groups(self, pred_seq, scores):
        pred_seq = np.asarray(pred_seq)
        if pred_seq.ndim == 1:
            pred_seq = pred_seq[None, :]
            if scores is not None:
                scores = np.asarray(scores).reshape(1, -1)

        all_boxes: List[np.ndarray] = []
        all_labels: List[np.ndarray] = []
        all_scores: List[np.ndarray] = []
        for b, seq in enumerate(pred_seq):
            eoc = np.flatnonzero(seq == self.CAPTION_END)
            start = int(eoc[0]) + 1 if eoc.size > 0 else 0
            groups = self._scan_box_groups(seq, start)
            if groups:
                all_boxes.append(np.array([g[1] for g in groups], dtype=np.float32))
                all_labels.append(np.array([g[0] for g in groups], dtype=np.int64))
                if scores is not None:
                    row = scores[b]
                    all_scores.append(np.array(
                        [row[g[2] + 1: g[2] + 5].mean() for g in groups],
                        dtype=np.float32))
            else:
                all_boxes.append(np.zeros((1, 4), dtype=np.float32))
                all_labels.append(np.zeros((0,), dtype=np.int64))
                if scores is not None:
                    all_scores.append(np.zeros((0,), dtype=np.float32))

        def pad(seqs, fill, width=None):
            n = max((s.shape[0] for s in seqs), default=0)
            if width is not None:
                out = np.full((len(seqs), n, width), fill, dtype=seqs[0].dtype)
            else:
                out = np.full((len(seqs), max(n, 0)), fill, dtype=seqs[0].dtype)
            for i, s in enumerate(seqs):
                out[i, : s.shape[0]] = s
            return out

        boxes = pad(all_boxes, 0.0, width=4)
        labels = pad(all_labels, -1)
        if scores is None:
            return boxes, labels, None
        return boxes, labels, pad(all_scores, -1.0)

    def adjust_bboxes_dimensions(self, boxes) -> np.ndarray:
        """Dequantize bin-unit boxes back to pixel space
        (data_processing.py:547-554)."""
        return self._rescale(np.asarray(boxes, dtype=float)).astype("float32")

    # -- token -> text -------------------------------------------------------
    def tokens_to_text(self, captions):
        """data_processing.py:760-770 semantics."""
        if not captions:
            return []
        if isinstance(captions[0], (int, np.integer)):
            captions = [[int(c)] for c in captions]
        return [" ".join(self.vocab.itos.get(int(t), "<UNK>") for t in cap)
                for cap in captions]

    def tokens_to_text_new(self, tokens_list, itos=None):
        """data_processing.py:775-783 semantics: joined words excluding
        special tokens."""
        itos = itos if itos is not None else self.vocab.itos
        special = {"<PAD>", "<SOS>", "<EOS>", "<UNK>"}
        if not tokens_list:
            return []
        if isinstance(tokens_list[0], (int, np.integer)):
            tokens_list = [tokens_list]
        return [" ".join(itos[int(t)] for t in toks
                         if itos.get(int(t)) not in special)
                for toks in tokens_list]

    def caption_string(self, tokens) -> str:
        """Human-readable caption from a full sequence: words between
        CAP_START and CAP_END joined by spaces."""
        ids = self.decode_captions(tokens)
        return " ".join(self.vocab.itos.get(int(t), "<UNK>") for t in ids)
