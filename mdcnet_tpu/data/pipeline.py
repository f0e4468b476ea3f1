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
                 synthetic_images=False, native_size: int = 256):
        self.records = records
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.synthetic = synthetic_images
        self.native_size = native_size
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
            int(self.records["label"][i]), box,
            str(self.records["caption"][i]))
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

    def mk(idx):
        ds = SteelDefectDataset(ann.take(records, idx), tokenizer,
                                cfg, synthetic_images)
        # one C++ call renders the whole split before first use (the cache
        # must be filled pre-use to stay consistent — see the method's NB);
        # silently lazy when the native tier is unavailable
        if synthetic_images == "learnable":
            ds.prefill_render_cache()
        return ds

    train = DataLoader(mk(tr), cfg.batch_size, shuffle=True,
                       seed=cfg.split_seed)
    valid = DataLoader(mk(va), cfg.batch_size, shuffle=False)
    test = DataLoader(mk(te), 2, shuffle=False, drop_last=False)
    return train, valid, test
