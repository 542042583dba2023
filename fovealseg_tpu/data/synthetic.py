"""Synthetic LVIS-shaped data for tests/benchmarks.

Generates batches with the cooked-dataset contract
(/root/reference/DynamicFocus/e_preprocess_scripts/dataset.py:118-142):
RGB image on a (canvas x canvas) canvas in [0,1], a gaze point inside the
instance mask normalized by the canvas size, a binary instance mask, and a
foreground class id in [0, num_fg_class).
"""

from __future__ import annotations

import numpy as np


def make_batch(
    rng: np.random.Generator,
    batch: int = 2,
    canvas: int = 640,
    num_fg_class: int = 50,
) -> dict:
    """Returns dict(img_data [B,H,W,3], focus_point [B,2], seg_label [B,H,W],
    cls_label [B]) as float32/int32 numpy arrays (NHWC)."""
    imgs = rng.uniform(0.0, 1.0, (batch, canvas, canvas, 3)).astype(np.float32)
    masks = np.zeros((batch, canvas, canvas), dtype=np.float32)
    focus = np.zeros((batch, 2), dtype=np.float32)
    cls = rng.integers(0, num_fg_class, (batch,)).astype(np.int32)

    for b in range(batch):
        # random ellipse instance
        cy, cx = rng.integers(canvas // 4, 3 * canvas // 4, 2)
        ry, rx = rng.integers(canvas // 16, canvas // 6, 2)
        yy, xx = np.mgrid[0:canvas, 0:canvas]
        inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        masks[b][inside] = 1.0
        # brighten the instance so there is signal to segment
        imgs[b][inside] = np.clip(imgs[b][inside] + 0.3, 0, 1)
        ys, xs = np.nonzero(inside)
        k = rng.integers(0, len(ys))
        focus[b] = (ys[k] / canvas, xs[k] / canvas)

    return {
        "img_data": imgs,
        "focus_point": focus,
        "seg_label": masks,
        "cls_label": cls,
    }
