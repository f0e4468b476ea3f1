"""Prediction visualization (PIL).

Reference: ``draw_bbox_with_caption`` (utilities.py:15-29) and the cv2
visualize helpers (inference_p.py:178-209).
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence


def draw_bbox_with_caption(image, bbox: Sequence[float], caption: str = "",
                           color: str = "red", width: int = 2):
    """Draw one xyxy box + caption text on a PIL image (in place) and return it."""
    from PIL import ImageDraw
    draw = ImageDraw.Draw(image)
    x0, y0, x1, y1 = [float(v) for v in bbox]
    draw.rectangle([x0, y0, x1, y1], outline=color, width=width)
    if caption:
        draw.text((x0, max(0.0, y0 - 12)), caption, fill=color)
    return image


def visualize(image, bboxes: Iterable[Sequence[float]],
              labels: Iterable[int], id2cls: Optional[dict] = None,
              captions: Optional[Iterable[str]] = None, color: str = "red"):
    """Draw all detections for one image (inference_p.py:178-209 surface).

    image: numpy uint8 HWC or PIL image. Returns a PIL image.
    """
    import numpy as np
    from PIL import Image
    if not hasattr(image, "save"):
        image = Image.fromarray(np.asarray(image).astype("uint8"))
    captions = list(captions) if captions is not None else None
    for i, (box, label) in enumerate(zip(bboxes, labels)):
        name = id2cls.get(int(label), str(label)) if id2cls else str(label)
        text = captions[i] if captions else name
        draw_bbox_with_caption(image, box, text, color=color)
    return image
