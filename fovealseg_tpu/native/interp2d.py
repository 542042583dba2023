"""Differentiable scattered-data -> dense interpolation ('tri' mode).

Rebuild of the reference's ``Interp2D`` (/root/reference/interp2d.py:14-91):
Delaunay-triangulate the valid points, locate every grid pixel's simplex with
barycentric weights (the modified qhull ``find_simplex(..., return_c=True)``),
gather the 3 corner values and blend. As in the reference, gradients flow
through ``values`` only — the triangulation/weights are data (host-computed
via the native library); the on-device blend is a plain gather+matmul, so
``interp2d_apply`` is jax-differentiable w.r.t. values.
"""

from __future__ import annotations

import numpy as np

from fovealseg_tpu.native.spatial import Delaunay, nearest_neighbor


def build_interp_plan(points: np.ndarray, h: int, w: int):
    """points: [N, 2] (row, col) valid pixel coords. Returns
    (corner_idx [h*w, 3] int32, weights [h*w, 3] float32) such that
    dense = (values[corner_idx] * weights).sum(-1). Pixels outside the
    convex hull fall back to their nearest valid point (weight 1)."""
    tri = Delaunay(points.astype(np.float64))
    ys, xs = np.mgrid[0:h, 0:w]
    q = np.stack([ys.ravel(), xs.ravel()], axis=-1).astype(np.float64)
    simplex, bary = tri.find_simplex(q, return_c=True)
    corner = np.zeros((h * w, 3), dtype=np.int32)
    weight = np.zeros((h * w, 3), dtype=np.float32)
    inside = simplex >= 0
    corner[inside] = tri.simplices[simplex[inside]]
    weight[inside] = bary[inside].astype(np.float32)
    if (~inside).any():
        nn = nearest_neighbor(points, q[~inside])
        corner[~inside, 0] = nn
        weight[~inside, 0] = 1.0
    return corner, weight


def interp2d_dense(points: np.ndarray, values: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reference-``Interp2D`` call shape: points [N, 2] (row, col), values
    [N, C] -> dense [C, h, w] (interp2d.py returns channels-first)."""
    corner, weight = build_interp_plan(points, h, w)
    dense = (values[corner] * weight[..., None]).sum(axis=1)  # [h*w, C]
    return dense.T.reshape(values.shape[1], h, w)


def interp2d_apply(values, corner, weight):
    """jit/grad-friendly blend: values [N, C] (jax or numpy), plan from
    build_interp_plan -> [h*w, C]."""
    import jax.numpy as jnp

    return (values[corner] * jnp.asarray(weight)[..., None]).sum(axis=1)


def _border_valid_mask(valid: np.ndarray) -> np.ndarray:
    """Pixels-for-interpolation mask (getPixelsForInterp semantics,
    models/models.py:170-211): valid pixels that border an invalid region
    (3x3 dilation of the invalid mask ∧ valid), plus the 4 corners."""
    inv = ~valid
    d = inv.copy()
    d[1:, :] |= inv[:-1, :]
    d[:-1, :] |= inv[1:, :]
    d[:, 1:] |= inv[:, :-1]
    d[:, :-1] |= inv[:, 1:]
    d[1:, 1:] |= inv[:-1, :-1]
    d[1:, :-1] |= inv[:-1, 1:]
    d[:-1, 1:] |= inv[1:, :-1]
    d[:-1, :-1] |= inv[1:, 1:]
    m = d & valid
    m[0, 0] = m[0, -1] = m[-1, 0] = m[-1, -1] = True
    return m


def fill_missing_tri(values: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Exact 'tri' hole fill (fillMissingValues_tensor 'tri' mode,
    models/models.py:159-286): Delaunay over the valid-border pixels (+4
    corners), barycentric interpolation at invalid pixels; valid pixels are
    untouched. values: [H, W, C] with anything at invalid pixels; corners'
    values are zeroed as in the reference (masked_for_interp corner rows
    force value 0 there). Host-side numpy via the native library."""
    h, w, c = values.shape
    if valid.all():
        return values
    m = _border_valid_mask(valid)
    vals = values.copy()
    for cy, cx in ((0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1)):
        if not valid[cy, cx]:
            vals[cy, cx] = 0.0
    pts = np.argwhere(m).astype(np.float64)  # (row, col)
    pvals = vals[m]  # [N, C]
    corner, weight = build_interp_plan(pts, h, w)
    dense = (pvals[corner] * weight[..., None]).sum(axis=1).reshape(h, w, c)
    out = values.copy()
    out[~valid] = dense[~valid]
    return out


def unwarp_prediction_tri(pred, grid_inv, valid) -> np.ndarray:
    """Reference-exact rev_deform_interp='tri' inverse warp (host path):
    bilinear-sample the prediction through the inverse grid, then
    Delaunay-barycentric fill of the holes, per sample. Inputs may be jax or
    numpy; returns numpy [B, Hs, Ws, C]."""
    import jax.numpy as jnp

    from fovealseg_tpu.core.warp import grid_sample

    gi = np.asarray(grid_inv, np.float32)
    va = np.asarray(valid)
    safe = np.where(np.isnan(gi), 0.0, gi)
    sampled = np.asarray(grid_sample(jnp.asarray(pred), jnp.asarray(safe)))
    out = np.empty_like(sampled)
    for b in range(sampled.shape[0]):
        out[b] = fill_missing_tri(sampled[b] * va[b][..., None], va[b])
    return out
