"""Input pipeline: host decode -> uint8 batches -> device preprocess.

The reference pipeline (VOCDataset + DataLoader, data_processing.py:110-219)
decodes, augments, resizes, normalizes and tokenizes per item on the host in
worker subprocesses, shipping float32 tensors.  TPU-native layout instead:

  host: image decode (PIL/cv2) + tokenization + padding only -> fixed-shape
        uint8 image batches and int32 token batches (4x less transfer than
        float32, and augmentation moves on-device);
  device: augment/resize/normalize fused into the train step's XLA program
          (mdcnet_tpu/data/augment.py);
  a background prefetch thread keeps ``prefetch_depth`` batches in flight so
  host decode overlaps device compute.

Semantics preserved: per-image token sequence built by the tokenizer
(one (label, bbox, caption) triple per row like VOCDataset._flatten_dataframe),
bboxes scaled to the resized image before quantization (the reference's
albumentations Resize happens before tokenization), per-batch right-padding
with PAD to max_len, train/valid/test three-way split with the reference's
exact sklearn seeds (splits.py).
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from mdcnet_tpu.config import PAD_ID, DataConfig
from mdcnet_tpu.data import annotations as ann
from mdcnet_tpu.data.splits import three_way_split
from mdcnet_tpu.text.tokenizer import SeqTokenizer


def load_image(path: str) -> Optional[np.ndarray]:
    """Decode one image to uint8 RGB (HWC). Returns None when missing,
    mirroring VOCDataset's skip-on-missing (data_processing.py:133-135)."""
    try:
        from PIL import Image
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except (FileNotFoundError, OSError):
        return None


#: canonical 3x3-grid position phrases (x-cell, y-cell) -> wording, fitted
#: on the GC10 annotations (82.0% agreement at 1/3 thresholds; the residual
#: ~18% is annotator wording noise that is not a function of the geometry —
#: docs/PARITY.md §14).
_POSITION_NAMES = {
    (0, 0): "left top", (1, 0): "top", (2, 0): "right top",
    (0, 1): "left", (1, 1): "center", (2, 1): "right",
    (0, 2): "left bottom", (1, 2): "bottom", (2, 2): "right bottom",
}


def position_phrase(box: np.ndarray, width: float, height: float) -> str:
    """Canonical caption position wording for a box center (3x3 grid at
    1/3 thresholds — the best deterministic fit to the GC10 wording)."""
    cx = (box[0] + box[2]) / 2.0 / width
    cy = (box[1] + box[3]) / 2.0 / height
    h = 0 if cx < 1 / 3 else (2 if cx > 2 / 3 else 1)
    v = 0 if cy < 1 / 3 else (2 if cy > 2 / 3 else 1)
    return _POSITION_NAMES[(h, v)]


def rewrite_position(caption: str, box: np.ndarray, width: float,
                     height: float) -> str:
    """Replace the template's position phrase with the canonical wording for
    ``box`` in a (width, height) frame; captions that don't match the GC10
    template ("... located at the X of the image") pass through unchanged."""
    import re
    phrase = position_phrase(box, width, height)
    return re.sub(r"located at the .+? of the image",
                  f"located at the {phrase} of the image", caption)


def zoom_crop(img: np.ndarray, box: np.ndarray, rng: np.random.Generator,
              min_scale: float = 0.35, box_margin: float = 1.3
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Random crop fully containing ``box`` (xyxy, image space).  The crop
    side is uniform in [max(min_scale, needed), 1.0] of each image side,
    where ``needed`` keeps a ``box_margin`` halo around the box.  Returns
    (cropped image view, box in crop space)."""
    h, w = img.shape[:2]
    bw, bh = box[2] - box[0], box[3] - box[1]
    s = rng.uniform(max(min_scale,
                        min(1.0, bw * box_margin / w),
                        min(1.0, bh * box_margin / h)), 1.0)
    cw, ch = max(int(round(s * w)), 8), max(int(round(s * h)), 8)
    # valid offsets keep the box inside the crop
    x_lo, x_hi = max(0, int(np.ceil(box[2])) - cw), min(int(box[0]), w - cw)
    y_lo, y_hi = max(0, int(np.ceil(box[3])) - ch), min(int(box[1]), h - ch)
    x_off = int(rng.integers(x_lo, x_hi + 1)) if x_hi >= x_lo else 0
    y_off = int(rng.integers(y_lo, y_hi + 1)) if y_hi >= y_lo else 0
    new_box = np.clip(box - np.array([x_off, y_off, x_off, y_off],
                                     box.dtype),
                      0.0, [cw, ch, cw, ch])
    return img[y_off:y_off + ch, x_off:x_off + cw], new_box


@dataclass
class Batch:
    images: np.ndarray        # (B, H, W, 3) uint8
    tokens: np.ndarray        # (B, max_len) int32, right-padded with PAD
    boxes: np.ndarray         # (B, 4) float32 pixel boxes (resized space)
    labels: np.ndarray        # (B,) int64


class SteelDefectDataset:
    """Flattened (image, bbox, caption, label) rows -> tokenized examples.

    ``synthetic_images``: False reads real files; True feeds uniform noise
    (shape-only testing); "learnable" renders class+box-conditioned defect
    images (data/synthetic.py) so quality metrics are trainable without the
    real GC10 pixels.
    """

    def __init__(self, records, tokenizer: SeqTokenizer, cfg: DataConfig,
                 synthetic_images=False, native_size: int = 256,
                 train: bool = False):
        self.records = records
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.synthetic = synthetic_images
        self.native_size = native_size
        self.train = train           # enables train-only host augmentation
        self.epoch = 0               # bumped by DataLoader between epochs
        self._boxes = ann.boxes_of(records)
        # rendered pixels are deterministic per index — cache them (a full
        # GC10 epoch is ~560 MB at 256px; re-rendering costs ~60s/epoch of
        # single-core host time otherwise)
        self._render_cache = {} if synthetic_images == "learnable" else None

    def prefill_render_cache(self, use_native: bool = True) -> int:
        """Render every learnable-synthetic image up front in ONE call to
        the native C++ renderer (mdcnet_tpu/native, ~10-30x the numpy path
        on one core).  Returns the number of images rendered; falls back to
        nothing (lazy numpy rendering) when the native tier is unavailable.

        NB: native noise is statistics-equivalent, not bit-identical, to
        the numpy renderer — prefill BEFORE first use so the cache is
        consistent for the whole run.
        """
        if self._render_cache is None or self._render_cache:
            return 0
        from mdcnet_tpu import native
        from mdcnet_tpu.data import synthetic as syn
        if not (use_native and native.available()):
            return 0
        idx = list(range(len(self)))
        labels = np.asarray([int(self.records["label"][i]) - syn.LABEL_START
                             for i in idx], np.int32)
        boxes = native.scale_boxes(
            np.asarray([self._boxes[i] for i in idx], np.float32),
            syn.CANVAS_W, syn.CANVAS_H, float(self.native_size))
        seeds = np.asarray(idx, np.uint64)
        imgs = native.render_defects(labels, boxes, seeds, self.native_size)
        for j, i in enumerate(idx):
            self._render_cache[i] = imgs[j]
        return len(idx)

    def __len__(self) -> int:
        return ann.num_rows(self.records)

    def example(self, i: int) -> Optional[Tuple[np.ndarray, List[int],
                                                np.ndarray, int]]:
        path = self.records["img_path"][i]
        if self.synthetic == "learnable":
            from mdcnet_tpu.data import synthetic as syn
            box_img = syn.scale_box_to_image(self._boxes[i], self.native_size)
            cached = self._render_cache.get(i)
            if cached is None:
                rng = np.random.default_rng(i)
                label = int(self.records["label"][i])
                cached = syn.render_defect_image(label, box_img,
                                                 self.native_size, rng)
                self._render_cache[i] = cached
            img = cached
            # geometry source is the rendered box (canvas-scaled), so pixels
            # and tokens agree exactly
            src_box = box_img
        elif self.synthetic:
            rng = np.random.default_rng(i)
            img = rng.integers(0, 255, (self.native_size, self.native_size, 3),
                               dtype=np.uint8)
            src_box = self._boxes[i]
        else:
            img = load_image(path)
            if img is None:
                return None
            src_box = self._boxes[i]
        caption = str(self.records["caption"][i])
        zoom_p = getattr(self.cfg, "zoom_crop_prob", 0.0)
        if self.train and zoom_p > 0.0:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.cfg.split_seed, self.epoch, i]))
            if rng.random() < zoom_p:
                img, src_box = zoom_crop(
                    img, np.asarray(src_box, np.float64), rng,
                    min_scale=getattr(self.cfg, "zoom_crop_min_scale", 0.35))
                # keep the caption's position wording consistent with the
                # crop-space geometry (the canonical 3x3 wording)
                caption = rewrite_position(caption, src_box,
                                           img.shape[1], img.shape[0])
        h, w = img.shape[:2]
        size = self.cfg.img_size
        # bbox in resized-image space before tokenization
        # (albumentations Resize with pascal_voc bbox_params, dataset.py:102-104)
        box = src_box * np.array([size / w, size / h,
                                  size / w, size / h])
        # guard out-of-bounds boxes (real images keep boxes in-bounds by
        # construction; the synthetic path and malformed annotations don't)
        box = np.clip(box, 0.0, size)
        if box[2] <= box[0]:
            box[2] = min(box[0] + 1.0, size)
        if box[3] <= box[1]:
            box[3] = min(box[1] + 1.0, size)
        seq = self.tokenizer.process_single_pair(
            int(self.records["label"][i]), box, caption)
        return img, seq, box.astype(np.float32), int(self.records["label"][i])


def collate(examples, max_len: int, image_hw: int) -> Batch:
    """Right-pad sequences with PAD and stack uint8 images resized on host to
    a common native grid (device does the final resize+normalize)."""
    b = len(examples)
    images = np.zeros((b, image_hw, image_hw, 3), np.uint8)
    tokens = np.full((b, max_len), PAD_ID, np.int32)
    boxes = np.zeros((b, 4), np.float32)
    labels = np.zeros((b,), np.int64)
    for i, (img, seq, box, label) in enumerate(examples):
        if img.shape[:2] != (image_hw, image_hw):
            from PIL import Image
            img = np.asarray(Image.fromarray(img).resize(
                (image_hw, image_hw)), dtype=np.uint8)
        images[i] = img
        tokens[i, : min(len(seq), max_len)] = seq[:max_len]
        boxes[i] = box
        labels[i] = label
    return Batch(images=images, tokens=tokens, boxes=boxes, labels=labels)


class DataLoader:
    """Batched iterator with background prefetch."""

    def __init__(self, dataset: SteelDefectDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 42,
                 drop_last: bool = True, prefetch_depth: int = 2,
                 image_hw: Optional[int] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch_depth = prefetch_depth
        self.image_hw = image_hw or dataset.cfg.img_size
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _produce(self, out_q: "queue.Queue"):
        self.ds.epoch = self._epoch  # varies the host augmentation draws
        idx = self._indices()
        step = self.batch_size
        stop = len(idx) - (len(idx) % step) if self.drop_last else len(idx)
        for s in range(0, stop, step):
            chunk = idx[s: s + step]
            examples = [e for e in (self.ds.example(int(i)) for i in chunk)
                        if e is not None]
            if not examples:
                continue
            out_q.put(collate(examples, self.ds.cfg.max_len, self.image_hw))
        out_q.put(None)

    def __iter__(self) -> Iterator[Batch]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        self._epoch += 1


class ImageOnlyDataset:
    """Image-path-only dataset for pure inference (VOCDatasetTest,
    inference_p.py:41-58 / inference_trail_after_good_map.py:155-182):
    yields uint8 image batches, no annotations required."""

    def __init__(self, img_paths, img_size: int = 224,
                 synthetic_images: bool = False, native_size: int = 256):
        self.paths = list(img_paths)
        self.img_size = img_size
        self.synthetic = synthetic_images
        self.native_size = native_size

    def __len__(self) -> int:
        return len(self.paths)

    def batches(self, batch_size: int):
        from PIL import Image
        for s in range(0, len(self.paths), batch_size):
            chunk = self.paths[s: s + batch_size]
            images = np.zeros((len(chunk), self.img_size, self.img_size, 3),
                              np.uint8)
            keep = []
            for i, p in enumerate(chunk):
                if self.synthetic:
                    rng = np.random.default_rng(s + i)
                    img = rng.integers(0, 255, (self.native_size,
                                                self.native_size, 3),
                                       dtype=np.uint8)
                else:
                    img = load_image(p)
                    if img is None:
                        continue
                images[len(keep)] = np.asarray(
                    Image.fromarray(img).resize((self.img_size,
                                                 self.img_size)),
                    dtype=np.uint8)
                keep.append(p)
            if keep:
                yield images[: len(keep)], keep


def make_loaders(records, tokenizer: SeqTokenizer, cfg: DataConfig,
                 synthetic_images=False
                 ) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """Three-way split + loaders matching get_loaders
    (data_processing.py:165-219): train shuffled at cfg.batch_size; valid
    at cfg.batch_size; test at batch 2 (the reference hardcodes it)."""
    tr, va, te = three_way_split(ann.num_rows(records), cfg.valid_size,
                                 cfg.test_size, cfg.split_seed)

    def mk(idx, train=False):
        ds = SteelDefectDataset(ann.take(records, idx), tokenizer,
                                cfg, synthetic_images, train=train)
        # one C++ call renders the whole split before first use (the cache
        # must be filled pre-use to stay consistent — see the method's NB);
        # silently lazy when the native tier is unavailable
        if synthetic_images == "learnable":
            ds.prefill_render_cache()
        return ds

    train = DataLoader(mk(tr, train=True), cfg.batch_size, shuffle=True,
                       seed=cfg.split_seed)
    valid = DataLoader(mk(va), cfg.batch_size, shuffle=False)
    test = DataLoader(mk(te), 2, shuffle=False, drop_last=False)
    return train, valid, test
