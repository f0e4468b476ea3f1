"""Learnable synthetic defect images.

No image files ship with the reference repo — only the GC10 annotation
summary (boxes live on the dataset's native 2048x1000 canvas).  The plain
``synthetic_images=True`` path feeds uniform noise, which exercises shapes
but can teach the model nothing.  This module renders images whose pixels
*determine* the targets, so the full quality pipeline (caption exact-match,
mAP@0.3, BLEU — the BASELINE gates) can be trained and measured end to end
without the real pixels; swapping in the real GC10 folder is a drop-in
(``--images`` + no synthetic flag).

Rendering: steel-gray textured background; inside the annotated box (scaled
from the 2048x1000 canvas) a class-specific patch — distinct base color plus
a class-indexed stripe pattern — so the label is recoverable from appearance
and the box from location.  Caption position words ("left top of the image")
stay consistent because the box geometry is the annotation's own.
"""
from __future__ import annotations

import numpy as np

from mdcnet_tpu.config import LABEL_START

# GC10-DET native canvas (max annotation extents: x<=2048, y<=1000)
CANVAS_W, CANVAS_H = 2048.0, 1000.0

# one distinct base RGB per class token 258..267
CLASS_COLORS = np.array([
    [220, 60, 60],    # 258 punching_hole
    [60, 220, 60],    # 259 welding_line
    [60, 60, 220],    # 260 crescent_gap
    [220, 220, 60],   # 261 water_spot
    [220, 60, 220],   # 262 oil_spot
    [60, 220, 220],   # 263 silk_spot
    [240, 140, 40],   # 264 inclusion
    [140, 40, 240],   # 265 rolled_pit
    [40, 240, 140],   # 266 crease
    [240, 240, 240],  # 267 waist_folding
], dtype=np.float32)


def scale_box_to_image(box_canvas: np.ndarray, size: int,
                       min_side: float = 2.0) -> np.ndarray:
    """GC10-canvas xyxy box -> (size, size) image space, in-bounds with a
    minimum side length."""
    box = np.asarray(box_canvas, np.float64) * np.array(
        [size / CANVAS_W, size / CANVAS_H, size / CANVAS_W, size / CANVAS_H])
    box = np.clip(box, 0.0, size)
    if box[2] - box[0] < min_side:
        box[2] = min(box[0] + min_side, size)
        box[0] = box[2] - min_side
    if box[3] - box[1] < min_side:
        box[3] = min(box[1] + min_side, size)
        box[1] = box[3] - min_side
    return box


def render_defect_image(label: int, box: np.ndarray, size: int,
                        rng: np.random.Generator) -> np.ndarray:
    """uint8 (size, size, 3) image: textured steel background, class-colored
    striped patch covering ``box`` (xyxy, already in image space)."""
    cls = int(label) - LABEL_START
    assert 0 <= cls < len(CLASS_COLORS), f"label {label} outside GC10 window"

    base = rng.normal(128.0, 12.0, (size, size, 1)).astype(np.float32)
    img = np.broadcast_to(base, (size, size, 3)).copy()
    # horizontal rolling bands, like cold-rolled steel sheet
    rows = np.arange(size, dtype=np.float32)
    img += 8.0 * np.sin(rows / 7.0)[:, None, None]

    x0, y0, x1, y1 = [int(round(v)) for v in box]
    x1 = max(x1, x0 + 1)
    y1 = max(y1, y0 + 1)
    h, w = y1 - y0, x1 - x0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # class-indexed stripe frequency and orientation
    freq = 0.25 + 0.15 * (cls % 5)
    stripes = np.sin((xx if cls % 2 == 0 else yy) * freq)
    patch = (CLASS_COLORS[cls][None, None, :] * (0.75 + 0.25 * stripes[..., None])
             + rng.normal(0.0, 6.0, (h, w, 3)))
    img[y0:y1, x0:x1] = patch
    return np.clip(img, 0, 255).astype(np.uint8)
