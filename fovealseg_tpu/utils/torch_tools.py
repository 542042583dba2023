"""Grid/fold helpers (numpy/jnp) — DynamicFocus utility/torch_tools.py port.

Covers the remaining torch_tools surface (/root/reference/DynamicFocus/
utility/torch_tools.py): ``get_padding``:6, ``cross_fold``/``cross_unfold``,
``interpolate_int`` majority pooling:54. The gaze-grid builders live in
``fovealseg_tpu.core.gaze``.
"""

from __future__ import annotations

import numpy as np


def get_padding(h: int, w: int, multiple: int) -> tuple[int, int, int, int]:
    """(left, right, top, bottom) padding to round (h, w) up to a multiple."""
    th = ((h - 1) // multiple + 1) * multiple
    tw = ((w - 1) // multiple + 1) * multiple
    dh, dw = th - h, tw - w
    return dw // 2, dw - dw // 2, dh // 2, dh - dh // 2


def cross_unfold(x: np.ndarray, size_step: int) -> np.ndarray:
    """[..., H, W] -> [..., H/k, W/k, k, k] non-overlapping tiling."""
    k = size_step
    *lead, h, w = x.shape
    assert h % k == 0 and w % k == 0
    y = x.reshape(*lead, h // k, k, w // k, k)
    return np.moveaxis(y, -3, -2)


def cross_fold(x: np.ndarray) -> np.ndarray:
    """Inverse of cross_unfold: [..., Hs, Ws, k, k] -> [..., Hs*k, Ws*k]."""
    *lead, hs, ws, k, k2 = x.shape
    assert k == k2
    y = np.moveaxis(x, -2, -3)
    return y.reshape(*lead, hs * k, ws * k)


def interpolate_int(x: np.ndarray, degree: int = 1) -> np.ndarray:
    """Majority-vote integer downsampling by 2**degree
    (torch_tools.interpolate_int:54-62). x: [..., H, W] int."""
    k = 2**degree
    tiles = cross_unfold(x, k)
    flat = tiles.reshape(*tiles.shape[:-2], k * k)
    max_v = int(flat.max()) + 1
    counts = np.apply_along_axis(lambda v: np.bincount(v, minlength=max_v), -1, flat)
    return counts.argmax(axis=-1).astype(x.dtype)
