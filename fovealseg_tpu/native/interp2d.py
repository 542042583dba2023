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
