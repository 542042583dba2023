"""ADE20K metadata surface (stand-in for the reference's data assets).

The reference ships ``data/object150_info.csv`` (class names/ratios, read at
eval.py:39) and ``data/color150.mat`` (a fixed 150-color palette used by
``colorEncode``). Neither binary asset is reproduced; instead:

* ``load_object_info(csv_path)`` reads a user-provided object-info csv with
  the reference's schema (Idx, Ratio, Train, Val, Stuff, Name) when present,
  else falls back to generic ``class_{i}`` names so every consumer works
  without the asset.
* ``class_palette(n)`` generates a deterministic palette
  (fovealseg_tpu.utils.visuals.generate_colormap_colors — the HSV wheel the
  reference's deform-path ``rgb_img`` uses, models/models.py:37-57) in place
  of the .mat colors.
"""

from __future__ import annotations

import csv
import os

import numpy as np


def load_object_info(csv_path: str | None, num_class: int = 150) -> list[dict]:
    """Class metadata rows [{idx, name, ratio}]; synthesized when absent."""
    if csv_path and os.path.exists(csv_path):
        rows = []
        with open(csv_path) as f:
            for rec in csv.DictReader(f):
                rows.append({
                    "idx": int(rec.get("Idx", len(rows) + 1)),
                    "name": (rec.get("Name") or "").split(";")[0].strip(),
                    "ratio": float(rec.get("Ratio", 0.0) or 0.0),
                })
        if rows:
            return rows
    return [{"idx": i + 1, "name": f"class_{i}", "ratio": 0.0} for i in range(num_class)]


def class_names(csv_path: str | None, num_class: int = 150) -> list[str]:
    return [r["name"] for r in load_object_info(csv_path, num_class)]


def class_palette(num_class: int = 150) -> np.ndarray:
    """[num_class, 3] uint8 palette (HSV wheel; replaces color150.mat)."""
    from fovealseg_tpu.utils.visuals import generate_colormap_colors

    return np.asarray(generate_colormap_colors(num_class), dtype=np.uint8)


def color_encode(label_map: np.ndarray, num_class: int = 150) -> np.ndarray:
    """Integer label map -> RGB uint8 image (the reference's colorEncode,
    utils.py, with the generated palette)."""
    pal = class_palette(num_class)
    lm = np.clip(np.asarray(label_map, np.int64), 0, num_class - 1)
    return pal[lm]
