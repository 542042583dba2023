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
                       gt_hr=None, saliency=None, grid_image=None,
                       sample_mask=None, image=None,
                       num_classes: int = 51) -> list[str]:
    """Write the reference's per-iteration dump set
    (models/models.py:989-1039 filename grammar: ``{tag}_{pred,gt,gt_hr,
    grid,sm,reddot}.png``); returns written paths."""
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
    if gt_hr is not None:
        rgb_img(gt_hr, num_classes).save(p("gt_hr"))
    if saliency is not None:
        s = np.asarray(saliency, dtype=np.float32)
        s = s / (s.max() + 1e-12)
        save_gray(s, p("sm"))
    if grid_image is not None:
        save_rgb01(grid_image, p("grid"))
    if image is not None and sample_mask is not None:
        save_rgb01(red_dot_overlay(image, sample_mask), p("reddot"))
    return written


def make_grid_pattern(h: int, w: int, spacing: int = 16) -> np.ndarray:
    """Synthetic line-grid image [H, W, 3] in [0, 1].

    Stand-in for the reference's ``data/grid/grid_1024_2048.png`` asset
    (models/models.py:853-866): warping this pattern through the deformation
    grid visualizes the non-uniform sampling density. Generated
    programmatically instead of shipping a binary asset."""
    img = np.ones((h, w, 3), dtype=np.float32)
    img[::spacing, :, :] = 0.0
    img[:, ::spacing, :] = 0.0
    return img


def collect_deform_visuals(module, variables, batch, num_classes: int = 51):
    """Run the deform module on one batch and assemble the dump-set arrays.

    Returns a dict of numpy arrays: pred [B,h,w,C] logits, gt [B,h,w] warped
    ground truth, gt_hr [B,H,W], sm [B,gh,gw] saliency, grid_image [B,h,w,3]
    (grid pattern warped through the sampling grid), sample_mask [B,H,W]
    (where a task pixel landed — the red-dot mask), image [B,H,W,3].
    jax is imported lazily so this module stays numpy-only otherwise.
    """
    import jax.numpy as jnp

    from fovealseg_tpu.core.grid import inverse_grid_index
    from fovealseg_tpu.core.warp import grid_sample

    x = jnp.asarray(batch["img_data"])
    f = jnp.asarray(batch["focus_point"])
    y = np.asarray(batch["seg_label"])
    cls = np.asarray(batch["cls_label"]).reshape(-1).astype(np.int64)
    bg = num_classes - 1

    out = module.apply(variables, x, f, train=False)
    grid = out["grid"]
    h, w = x.shape[1], x.shape[2]
    pattern = jnp.asarray(make_grid_pattern(h, w))[None]
    pattern = jnp.broadcast_to(pattern, (x.shape[0], h, w, 3))
    grid_image = grid_sample(pattern, grid)
    _, valid = inverse_grid_index(grid, (h, w))

    y_sampled = np.asarray(
        grid_sample(jnp.asarray(y, jnp.float32)[..., None], out["grid_y"])[..., 0]
    ).astype(np.int64)
    gt = y_sampled * cls[:, None, None] + (1 - y_sampled) * bg
    gt_hr = y.astype(np.int64) * cls[:, None, None] + (1 - y.astype(np.int64)) * bg

    return {
        "pred": np.asarray(out["pred"], np.float32),
        "gt": gt,
        "gt_hr": gt_hr,
        "sm": np.asarray(out["xs"][..., 0], np.float32),
        "grid_image": np.asarray(grid_image, np.float32),
        "sample_mask": np.asarray(valid),
        "image": np.asarray(x, np.float32),
    }


def dump_batch_visuals(save_dir: str, vis: dict, cur_iter: int = 0,
                       num_classes: int = 51, max_items: int | None = None) -> list[str]:
    """Dump ``collect_deform_visuals`` output for the first B/2 samples with
    the reference's ``iter{it}_batch{i}_*`` naming (models/models.py:989+)."""
    b = vis["pred"].shape[0]
    n = max_items if max_items is not None else max(1, b // 2)
    written = []
    for i in range(min(n, b)):
        written += dump_train_visuals(
            save_dir,
            f"iter{cur_iter}_batch{i}",
            pred_logits=vis["pred"][i],
            gt=vis["gt"][i],
            gt_hr=vis["gt_hr"][i],
            saliency=vis["sm"][i],
            grid_image=vis["grid_image"][i],
            sample_mask=vis["sample_mask"][i],
            image=vis["image"][i],
            num_classes=num_classes,
        )
    return written
