"""Metrics: warped-domain pixel-accuracy family, IoU, confusion, hd95.

Mirrors /root/reference/models/models.py:378-474 (pixel_acc family; class
``num_class-1`` = 50 is background), /root/reference/utils.py:231-317
(accuracy / intersectionAndUnion / confusion_matrix) and utils.py:25-101
(surface-distance hd95), plus the DynamicFocus metric helpers
(/root/reference/DynamicFocus/d_model/nn_A3_metrics.py:8-147).

The jnp functions are jit-safe; hd95 is a host-side (numpy) eval metric.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# warped-domain accuracy family (logits [B, H, W, C], labels [B, H, W])
# --------------------------------------------------------------------------

def _preds(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logits, axis=-1)


def pixel_acc(logits: jnp.ndarray, labels: jnp.ndarray, bg_class: int = 50) -> jnp.ndarray:
    """Per-sample fg-class accuracy over the fg union (models/models.py:381-399)."""
    preds = _preds(logits)
    valid = labels < bg_class
    valid1 = preds < bg_class
    inter = jnp.sum(valid & (preds == labels), axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(valid | valid1, axis=(1, 2)).astype(jnp.float32)
    return jnp.mean(inter / (union + 1e-10))


def fg_bin_pixel_acc(logits: jnp.ndarray, labels: jnp.ndarray, bg_class: int = 50) -> jnp.ndarray:
    """Binary (fg-vs-bg) IoU-style accuracy (models/models.py:401-421)."""
    preds = _preds(logits)
    valid = labels < bg_class
    valid1 = preds < bg_class
    inter = jnp.sum(valid & valid1, axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(valid | valid1, axis=(1, 2)).astype(jnp.float32)
    return jnp.mean(inter / (union + 1e-10))


def fbg_cls_pixel_acc(logits: jnp.ndarray, labels: jnp.ndarray, bg_class: int = 50) -> jnp.ndarray:
    """Class-correct accuracy averaged 50/50 over fg and bg unions
    (models/models.py:423-451)."""
    preds = _preds(logits)
    eq = preds == labels
    v_fg, v1_fg = labels < bg_class, preds < bg_class
    v_bg, v1_bg = labels == bg_class, preds == bg_class
    acc_fg = jnp.sum(v_fg & eq, axis=(1, 2)) / (jnp.sum(v_fg | v1_fg, axis=(1, 2)) + 1e-10)
    acc_bg = jnp.sum(v_bg & eq, axis=(1, 2)) / (jnp.sum(v_bg | v1_bg, axis=(1, 2)) + 1e-10)
    return jnp.mean(0.5 * acc_fg + 0.5 * acc_bg)


def fbg_bin_pixel_acc(logits: jnp.ndarray, labels: jnp.ndarray, bg_class: int = 50) -> jnp.ndarray:
    """Binary accuracy averaged 50/50 over fg and bg unions
    (models/models.py:453-474)."""
    preds = _preds(logits)
    v_fg, v1_fg = labels < bg_class, preds < bg_class
    v_bg, v1_bg = labels == bg_class, preds == bg_class
    acc_fg = jnp.sum(v_fg & v1_fg, axis=(1, 2)) / (jnp.sum(v_fg | v1_fg, axis=(1, 2)) + 1e-10)
    acc_bg = jnp.sum(v_bg & v1_bg, axis=(1, 2)) / (jnp.sum(v_bg | v1_bg, axis=(1, 2)) + 1e-10)
    return jnp.mean(0.5 * acc_fg + 0.5 * acc_bg)


# --------------------------------------------------------------------------
# full-resolution eval metrics (utils.py family)
# --------------------------------------------------------------------------

def accuracy(preds: jnp.ndarray, label: jnp.ndarray):
    """(acc, num_valid) with valid = label >= 0 (utils.py:231-239)."""
    valid = label >= 0
    acc_sum = jnp.sum(valid & (preds == label))
    valid_sum = jnp.sum(valid)
    return acc_sum.astype(jnp.float32) / (valid_sum + 1e-10), valid_sum


def intersection_and_union(preds: jnp.ndarray, label: jnp.ndarray, num_class: int):
    """Per-class (intersection, union) histograms (utils.py:289-317).
    Pixels with label < 0 are ignored (pred is shifted out of range)."""
    preds = jnp.where(label >= 0, preds, num_class)
    label = jnp.where(label >= 0, label, num_class)
    inter = jnp.where(preds == label, preds, num_class)
    hist = lambda x: jnp.bincount(x.reshape(-1), length=num_class + 1)[:num_class]
    area_inter = hist(inter)
    area_pred = hist(preds)
    area_lab = hist(label)
    union = area_pred + area_lab - area_inter
    return area_inter, union


def confusion_matrix(preds: jnp.ndarray, label: jnp.ndarray, num_class: int) -> jnp.ndarray:
    """[C, C] confusion counts over valid (label>=0) pixels (utils.py:262-287)."""
    valid = (label >= 0) & (label < num_class)
    idx = jnp.where(valid, label * num_class + preds, num_class * num_class)
    flat = jnp.bincount(idx.reshape(-1), length=num_class * num_class + 1)
    return flat[: num_class * num_class].reshape(num_class, num_class)


def trimap_band(label: np.ndarray, width: int = 5) -> np.ndarray:
    """Boundary band mask: pixels within ``width`` (Chebyshev) of a class
    boundary — the VAL.trimap evaluation region (eval.py trimap path;
    VAL.trimap_dia_factor). Host-side numpy."""
    lab = np.asarray(label)
    pad = np.pad(lab, 1, mode="edge")
    boundary = (
        (pad[1:-1, 1:-1] != pad[:-2, 1:-1])
        | (pad[1:-1, 1:-1] != pad[2:, 1:-1])
        | (pad[1:-1, 1:-1] != pad[1:-1, :-2])
        | (pad[1:-1, 1:-1] != pad[1:-1, 2:])
    )
    band = boundary.copy()
    for _ in range(width):
        p = np.pad(band, 1, mode="constant")
        band = p[1:-1, 1:-1] | p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:]
    return band


def trimap_accuracy(preds: np.ndarray, label: np.ndarray, width: int = 5) -> float:
    """Pixel accuracy restricted to the boundary band (VAL.trimap)."""
    band = trimap_band(label, width)
    if band.sum() == 0:
        return float("nan")
    return float((preds[band] == label[band]).mean())


def binary_dice(preds: np.ndarray, label: np.ndarray) -> float:
    """Binary Dice coefficient (VAL.dice path)."""
    inter = np.sum((preds > 0) & (label > 0))
    s = np.sum(preds > 0) + np.sum(label > 0)
    return float(2.0 * inter / (s + 1e-10))


def _boundary(mask: np.ndarray) -> np.ndarray:
    """4-neighborhood boundary pixels of a binary mask."""
    m = mask.astype(bool)
    pad = np.pad(m, 1, mode="constant")
    eroded = pad[1:-1, 1:-1] & pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:]
    return m & ~eroded


def hd95(pred_mask: np.ndarray, gt_mask: np.ndarray) -> float:
    """95th-percentile symmetric surface distance (utils.py:25-101).

    Host-side numpy, EDT-based like the reference (distance transform of the
    complemented border evaluated at the other mask's border — O(HW) memory;
    a dense pairwise matrix OOMs at full-res eval: ~20k boundary pixels ->
    a 6.4 GB 20k x 20k array). Returns NaN for empty masks where the
    reference raises (documented deviation: eval must survive empty preds).
    """
    from scipy.ndimage import distance_transform_edt

    pb = _boundary(pred_mask)
    gb = _boundary(gt_mask)
    if not pb.any() or not gb.any():
        return float("nan")
    # EDT of the complement gives, at every pixel, the exact euclidean
    # distance to the nearest border pixel (reference __surface_distances)
    d_pg = distance_transform_edt(~gb)[pb]
    d_gp = distance_transform_edt(~pb)[gb]
    return float(np.percentile(np.hstack([d_pg, d_gp]), 95))
