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


def build_fill_plan(valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Whole-canvas 'tri' fill plan over FLAT canvas indices.

    valid: [H, W] bool. Returns (corner [H*W, 3] int32, weight [H*W, 3]
    float32) such that, for ``v = (sampled * valid)`` flattened to [H*W, C],
    ``out = (v[corner] * weight[..., None]).sum(1)`` reproduces
    :func:`fill_missing_tri` at invalid pixels and is the identity at valid
    pixels (corner row = own index, weight (1,0,0)). Because the plan indexes
    the *masked* sampled image, the reference's forced-zero invalid-corner
    values (models/models.py:159-286) fall out automatically. The plan is
    pure hole-geometry data — the on-device blend (one gather + a 3-wide
    matmul) is jax-jittable and differentiable w.r.t. values, matching the
    reference 'tri' gradient contract (interp2d.py:84-89)."""
    h, w = valid.shape
    flat = np.arange(h * w, dtype=np.int32)
    corner = np.zeros((h * w, 3), dtype=np.int32)
    weight = np.zeros((h * w, 3), dtype=np.float32)
    corner[:, 0] = flat
    weight[:, 0] = 1.0
    if valid.all():
        return corner, weight
    m = _border_valid_mask(valid)
    pts = np.argwhere(m).astype(np.float64)  # (row, col)
    flat_pts = (pts[:, 0] * w + pts[:, 1]).astype(np.int32)
    c_local, wgt = build_interp_plan(pts, h, w)
    inv = ~valid.ravel()
    corner[inv] = flat_pts[c_local[inv]]
    weight[inv] = wgt[inv]
    return corner, weight


def unwarp_prediction_tri_device(pred, grid_inv, valid):
    """Production 'tri' inverse warp: host Delaunay plan + on-device blend.

    Same result as :func:`unwarp_prediction_tri` (the per-sample host
    oracle), but only the PLAN (Delaunay + barycentric weights over the hole
    geometry) is computed host-side; the bilinear inverse-warp gather and the
    3-corner blend run on device as one jitted gather+matmul. Returns a jax
    array [B, Hs, Ws, C]. The eval CLI uses this for
    ``MODEL.rev_deform_interp='tri'`` (the reference default,
    config/defaults.py:60) when ``TPU.tri_exact`` is on."""
    import jax.numpy as jnp

    sample_fn, blend_fn = _tri_device_fns()
    b = pred.shape[0]
    hs, ws = grid_inv.shape[1], grid_inv.shape[2]
    safe = jnp.where(jnp.isnan(jnp.asarray(grid_inv)), 0.0, jnp.asarray(grid_inv))
    sampled = sample_fn(jnp.asarray(pred, jnp.float32), safe, jnp.asarray(valid))
    va_host = np.asarray(valid)
    plans = [build_fill_plan(va_host[i]) for i in range(b)]
    corner = jnp.asarray(np.stack([c for c, _ in plans]))
    weight = jnp.asarray(np.stack([w for _, w in plans]))
    return blend_fn(sampled, corner, weight).reshape(b, hs, ws, pred.shape[-1])


_TRI_FNS: list = []


def _tri_device_fns():
    if _TRI_FNS:
        return _TRI_FNS[0]
    import jax
    import jax.numpy as jnp

    from fovealseg_tpu.core.warp import grid_sample

    @jax.jit
    def sample_fn(pred, grid_safe, valid):
        s = grid_sample(pred, grid_safe)
        return s * valid[..., None].astype(s.dtype)

    @jax.jit
    def blend_fn(sampled, corner, weight):
        b, hs, ws, c = sampled.shape
        off = jnp.arange(b, dtype=corner.dtype)[:, None, None] * (hs * ws)
        g = sampled.reshape(b * hs * ws, c)[(corner + off).reshape(-1)]
        g = g.reshape(b, hs * ws, 3, c)
        return (g * weight[..., None]).sum(axis=2)

    _TRI_FNS.append((sample_fn, blend_fn))
    return _TRI_FNS[0]


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
