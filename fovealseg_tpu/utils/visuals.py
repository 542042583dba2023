"""Visualization dumps (PNG) — surface parity with the reference's train/eval
image dumps.

Rebuilds /root/reference/models/models.py:37-57 (``rgb_img`` HSV class
palette, class 50 = black background) and the per-iteration dump set
(pred/gt/grid/saliency/red-dot sampling mask, models/models.py:973-1051;
models_instance.py:1022-1105).
"""

from __future__ import annotations

import colorsys
import os

import numpy as np


def generate_colormap_colors(num_colors: int = 51) -> list[tuple[int, int, int]]:
    """HSV wheel palette; last class (background) is black
    (models/models.py:37-43)."""
    colors = []
    for i in range(num_colors):
        r, g, b = colorsys.hsv_to_rgb(i / num_colors, 1.0, 1.0)
        colors.append((int(r * 255), int(g * 255), int(b * 255)))
    colors[-1] = (0, 0, 0)
    return colors


def rgb_img(class_map: np.ndarray, num_classes: int = 51):
    """Integer class map [H, W] -> PIL RGB image with the HSV palette."""
    from PIL import Image

    palette = np.asarray(generate_colormap_colors(num_classes), dtype=np.uint8)
    cm = np.clip(np.asarray(class_map, dtype=np.int64), 0, num_classes - 1)
    return Image.fromarray(palette[cm])


def save_gray(img01: np.ndarray, path: str) -> None:
    """[H, W] floats in [0, 1] -> grayscale PNG (saliency-map dumps)."""
    from PIL import Image

    arr = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr, "L").save(path)


def save_rgb01(img01: np.ndarray, path: str) -> None:
    """[H, W, 3] floats in [0, 1] -> PNG."""
    from PIL import Image

    arr = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def red_dot_overlay(image01: np.ndarray, sample_mask: np.ndarray) -> np.ndarray:
    """Mark sampled full-res pixels in red (the ``reddot`` dump,
    models/models.py:1012-1039). image01 [H, W, 3]; sample_mask [H, W] bool
    (True where a task pixel landed); mask is dilated once (3x3)."""
    m = np.asarray(sample_mask, dtype=bool)
    d = m.copy()
    d[1:, :] |= m[:-1, :]
    d[:-1, :] |= m[1:, :]
    d[:, 1:] |= m[:, :-1]
    d[:, :-1] |= m[:, 1:]
    out = np.asarray(image01, dtype=np.float32).copy()
    out[d] = np.asarray([1.0, 0.0, 0.0], dtype=np.float32)
    return out


def dump_train_visuals(save_dir: str, tag: str, *, pred_logits=None, gt=None,
                       saliency=None, x_sampled=None, sample_mask=None,
                       image=None, num_classes: int = 51) -> list[str]:
    """Write the reference's per-iteration dump set; returns written paths."""
    os.makedirs(save_dir, exist_ok=True)
    written = []

    def p(name):
        path = os.path.join(save_dir, f"{tag}_{name}.png")
        written.append(path)
        return path

    if pred_logits is not None:
        rgb_img(np.argmax(pred_logits, axis=-1), num_classes).save(p("pred"))
    if gt is not None:
        rgb_img(gt, num_classes).save(p("gt"))
    if saliency is not None:
        s = np.asarray(saliency, dtype=np.float32)
        s = s / (s.max() + 1e-12)
        save_gray(s, p("sm"))
    if x_sampled is not None:
        save_rgb01(x_sampled, p("grid"))
    if image is not None and sample_mask is not None:
        save_rgb01(red_dot_overlay(image, sample_mask), p("reddot"))
    return written
