"""Annotation ingestion: comma-separated txt -> structured record arrays.

Reference semantics (dataset.py:31-86):
  - line format: ``file_name,ids,label,xmin,ymin,xmax,ymax,caption``
  - the header line is skipped
  - lines with fewer than 7 comma-separated parts are skipped
  - the caption is optional; missing captions become "No caption"
  - img_path = join(image_folder, file_name); a ``.jpg`` suffix is appended
    when absent (trail_01.py:44)

The legacy NEU-DET parser (xml_to_xls.py:13-82) maps 6 class names to ids 0-5.

Output is a plain dict-of-numpy-columns table (no pandas requirement on the
hot path; ``to_dataframe`` converts when pandas-based tooling wants it).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from mdcnet_tpu.config import NEU_CLASS_IDS

Columns = Dict[str, np.ndarray]


def parse_annotation_lines(lines: List[str], image_folder: str = "",
                           append_jpg: bool = True) -> Columns:
    """Parse raw annotation lines (header included) into columns."""
    ids: List[str] = []
    captions: List[str] = []
    labels: List[int] = []
    xmin: List[int] = []
    ymin: List[int] = []
    xmax: List[int] = []
    ymax: List[int] = []
    img_paths: List[str] = []

    for line in lines[1:]:
        parts = line.strip().split(",")
        if len(parts) < 7:
            continue
        image_name = parts[0]
        image_id = parts[1]
        try:
            label = int(parts[2])
            coords = [int(c) for c in parts[3:7]]
        except ValueError:
            continue
        # commas inside the caption were split apart; re-join the tail
        caption = ",".join(parts[7:]) if len(parts) > 7 else "No caption"

        path = os.path.join(image_folder, image_name)
        if append_jpg and not path.lower().endswith(".jpg"):
            path = f"{path}.jpg"

        ids.append(image_id)
        captions.append(caption)
        labels.append(label)
        xmin.append(coords[0])
        ymin.append(coords[1])
        xmax.append(coords[2])
        ymax.append(coords[3])
        img_paths.append(path)

    return {
        "ids": np.array(ids, dtype=object),
        "caption": np.array(captions, dtype=object),
        "label": np.array(labels, dtype=np.int64),
        "xmin": np.array(xmin, dtype=np.int64),
        "ymin": np.array(ymin, dtype=np.int64),
        "xmax": np.array(xmax, dtype=np.int64),
        "ymax": np.array(ymax, dtype=np.int64),
        "img_path": np.array(img_paths, dtype=object),
    }


def txt_file_to_records(txt_file_path: str, image_folder: str,
                        append_jpg: bool = True) -> Columns:
    """File-based entry point matching ``txt_file_to_df`` (dataset.py:31-86)."""
    with open(txt_file_path, "r") as f:
        lines = f.readlines()
    return parse_annotation_lines(lines, image_folder, append_jpg=append_jpg)


def filter_existing_images(records: Columns) -> Columns:
    """Drop rows whose image file does not exist (trail_01.py:48-49)."""
    mask = np.array([os.path.exists(p) for p in records["img_path"]])
    return {k: v[mask] for k, v in records.items()}


def take(records: Columns, idx: np.ndarray) -> Columns:
    return {k: v[idx] for k, v in records.items()}


def num_rows(records: Columns) -> int:
    return len(records["img_path"])


def boxes_of(records: Columns) -> np.ndarray:
    """(N, 4) xyxy pixel boxes."""
    return np.stack([records["xmin"], records["ymin"],
                     records["xmax"], records["ymax"]], axis=1).astype(np.float64)


def to_dataframe(records: Columns):
    import pandas as pd
    return pd.DataFrame({k: list(v) for k, v in records.items()})


def to_excel(records: Columns, path: str) -> None:
    """Write the records as an Excel sheet (xml_to_xls.py:54-82 surface)."""
    to_dataframe(records).to_excel(path, index=False)


def parse_neu_annotation_lines(lines: List[str],
                               image_folder: str = "") -> Columns:
    """Legacy NEU-DET 6-class parser (xml_to_xls.py:23-51): line format
    ``file_stem class_name xmin ymin xmax ymax`` (whitespace separated)."""
    out = {k: [] for k in ("ids", "caption", "label", "xmin", "ymin",
                           "xmax", "ymax", "img_path")}
    for line in lines:
        parts = line.strip().split()
        if len(parts) < 6:
            continue
        name, cls = parts[0], parts[1]
        if cls not in NEU_CLASS_IDS:
            continue
        coords = [int(float(c)) for c in parts[2:6]]
        out["ids"].append(cls)
        out["caption"].append("No caption")
        out["label"].append(NEU_CLASS_IDS[cls])
        out["xmin"].append(coords[0])
        out["ymin"].append(coords[1])
        out["xmax"].append(coords[2])
        out["ymax"].append(coords[3])
        out["img_path"].append(os.path.join(image_folder, f"{name}.jpg"))
    return {
        "ids": np.array(out["ids"], dtype=object),
        "caption": np.array(out["caption"], dtype=object),
        "label": np.array(out["label"], dtype=np.int64),
        "xmin": np.array(out["xmin"], dtype=np.int64),
        "ymin": np.array(out["ymin"], dtype=np.int64),
        "xmax": np.array(out["xmax"], dtype=np.int64),
        "ymax": np.array(out["ymax"], dtype=np.int64),
        "img_path": np.array(out["img_path"], dtype=object),
    }
