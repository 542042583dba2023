"""Gaze-conditioning maps (pure jnp).

Reproduces the focus-map construction in the deform forward
(/root/reference/models/models.py:684-707) and the auxiliary map builders
(`gen_grid_mtx_2xHxW` / `gen_focus_Gaussian_HxW`,
/root/reference/DynamicFocus/utility/torch_tools.py:65-99; `create_map` /
`smooth_map_with_gaussian`, models/models.py:288-358).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def grid_coords(h: int, w: int, dtype=jnp.float32):
    """(row, col) index maps of shape [h, w] (gen_grid_mtx_2xHxW)."""
    rows = jnp.arange(h, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    cols = jnp.ones((h, 1), dtype) * jnp.arange(w, dtype=dtype)[None, :]
    return rows, cols


def focus_distance_map(focus_point: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Normalized squared gaze-distance map, [B, h, w, 1].

    ``focus_point`` is [B, 2] with (row, col) in [0, 1] (the cooked dataset's
    ``F_2`` — DynamicFocus/e_preprocess_scripts/dataset.py:125). Matches
    models/models.py:690-694: ``(dist / sqrt(h^2+w^2))**2``.
    """
    rows, cols = grid_coords(h, w)
    hidx = focus_point[:, 0] * (h - 1.0)
    widx = focus_point[:, 1] * (w - 1.0)
    d2 = (rows[None] - hidx[:, None, None]) ** 2 + (cols[None] - widx[:, None, None]) ** 2
    max_dist2 = float(h * h + w * w)
    return (d2 / max_dist2)[..., None]


def focus_gaussian_map(
    focus_point: jnp.ndarray, h: int, w: int, std: float = 512.0
) -> jnp.ndarray:
    """Gaussian-of-distance focus map, peak-normalized to 1 (alternate focus
    map; gen_focus_Gaussian_HxW torch_tools.py:83-92). [B, h, w, 1]."""
    rows, cols = grid_coords(h, w)
    hidx = focus_point[:, 0] * (h - 1.0)
    widx = focus_point[:, 1] * (w - 1.0)
    dist = jnp.sqrt(
        (rows[None] - hidx[:, None, None]) ** 2 + (cols[None] - widx[:, None, None]) ** 2
    )
    coeff = 1.0 / (std * math.sqrt(2.0 * math.pi))
    val = coeff * jnp.exp(-0.5 * (dist / std) ** 2)
    val = val / jnp.max(val, axis=(1, 2), keepdims=True)
    return val[..., None]


def cosine_decay_map(
    focus_point: jnp.ndarray,
    h: int,
    w: int,
    radius: float = 25.0,
    max_value: float = 0.5,
    min_value: float = 0.05,
) -> jnp.ndarray:
    """Cosine-decay focus map within ``radius`` of the gaze, else
    ``min_value`` (create_map, models/models.py:288-320). [B, h, w, 1]."""
    rows, cols = grid_coords(h, w)
    hidx = focus_point[:, 0] * (h - 1.0)
    widx = focus_point[:, 1] * (w - 1.0)
    dist = jnp.sqrt(
        (rows[None] - hidx[:, None, None]) ** 2 + (cols[None] - widx[:, None, None]) ** 2
    )
    decay = 0.5 * (1.0 + jnp.cos(math.pi * dist / radius))
    val = jnp.where(dist <= radius, min_value + (max_value - min_value) * decay, min_value)
    return val[..., None]
