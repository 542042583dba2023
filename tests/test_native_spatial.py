"""Native C++ spatial library vs scipy oracles."""

import numpy as np
import pytest

scipy_spatial = pytest.importorskip("scipy.spatial")

from fovealseg_tpu.native.interp2d import build_interp_plan, interp2d_dense
from fovealseg_tpu.native.spatial import Delaunay, directed_hausdorff, nearest_neighbor


def test_delaunay_matches_scipy_triangle_set(rng):
    pts = rng.uniform(0, 100, (60, 2))
    ours = Delaunay(pts)
    ref = scipy_spatial.Delaunay(pts)
    # same triangulation as sets of vertex triples (Delaunay is unique for
    # points in general position)
    a = {tuple(sorted(t)) for t in ours.simplices}
    b = {tuple(sorted(t)) for t in ref.simplices}
    assert a == b


def test_find_simplex_barycentric_reconstruction(rng):
    pts = rng.uniform(0, 50, (40, 2))
    tri = Delaunay(pts)
    q = rng.uniform(5, 45, (200, 2))
    simplex, bary = tri.find_simplex(q, return_c=True)
    inside = simplex >= 0
    assert inside.mean() > 0.5
    # barycentric blend of corner coordinates reconstructs the query point
    corners = pts[tri.simplices[simplex[inside]]]  # [k, 3, 2]
    rec = (corners * bary[inside][..., None]).sum(axis=1)
    np.testing.assert_allclose(rec, q[inside], atol=1e-8)


def test_nearest_neighbor_matches_brute(rng):
    pts = rng.uniform(0, 10, (80, 2))
    q = rng.uniform(-1, 11, (300, 2))
    ours = nearest_neighbor(pts, q)
    d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ref = d.argmin(axis=1)
    # distances must match exactly (ties may differ in index)
    np.testing.assert_allclose(d[np.arange(len(q)), ours], d[np.arange(len(q)), ref])


def test_directed_hausdorff_matches_scipy(rng):
    a = rng.uniform(0, 5, (50, 2))
    b = rng.uniform(0, 5, (70, 2))
    ours = directed_hausdorff(a, b)
    ref = scipy_spatial.distance.directed_hausdorff(a, b)[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_interp2d_dense_matches_linear_nd(rng):
    """'tri' interpolation == scipy LinearNDInterpolator inside the hull."""
    h = w = 24
    pts = rng.integers(0, 24, (60, 2)).astype(np.float64)
    pts = np.unique(pts, axis=0)
    # jitter off the integer grid: cocircular quadruples make the Delaunay
    # diagonal choice ambiguous (both ours and scipy's are valid)
    pts += rng.uniform(-1e-3, 1e-3, pts.shape)
    vals = rng.standard_normal((len(pts), 3)).astype(np.float64)
    dense = interp2d_dense(pts, vals, h, w)
    from scipy.interpolate import LinearNDInterpolator

    ref = LinearNDInterpolator(pts, vals)
    ys, xs = np.mgrid[0:h, 0:w]
    refd = ref(np.stack([ys.ravel(), xs.ravel()], -1)).reshape(h, w, 3)
    inside = ~np.isnan(refd[..., 0])
    ours_hwc = np.moveaxis(dense, 0, -1)
    np.testing.assert_allclose(ours_hwc[inside], refd[inside], atol=1e-5)


def test_interp_plan_gradients_flow():
    """interp2d_apply is differentiable w.r.t. values (like the reference
    Interp2D whose backward flows through values only, interp2d.py:84-89)."""
    import jax
    import jax.numpy as jnp

    pts = np.array([[0, 0], [0, 7], [7, 0], [7, 7], [3, 4]], dtype=np.float64)
    corner, weight = build_interp_plan(pts, 8, 8)

    def f(vals):
        from fovealseg_tpu.native.interp2d import interp2d_apply

        return interp2d_apply(vals, corner, weight).sum()

    g = jax.grad(f)(jnp.ones((5, 2)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_fill_missing_tri_semantics(rng):
    """'tri' fill: valid pixels untouched; holes are barycentric blends of
    border-valid values (within their min/max inside the hull)."""
    from fovealseg_tpu.native.interp2d import fill_missing_tri

    h = w = 20
    valid = rng.uniform(0, 1, (h, w)) > 0.6
    valid[0, 0] = valid[0, -1] = valid[-1, 0] = valid[-1, -1] = True
    vals = rng.standard_normal((h, w, 2)).astype(np.float64)
    out = fill_missing_tri(vals, valid)
    np.testing.assert_array_equal(out[valid], vals[valid])
    assert np.isfinite(out).all()
    lo, hi = vals[valid].min() - 1e-9, vals[valid].max() + 1e-9
    hole_vals = out[~valid]
    assert (hole_vals >= min(lo, 0)).all() and (hole_vals <= max(hi, 0)).all()


def test_unwarp_prediction_tri_constant(rng):
    """A constant prediction unwarps to the constant under 'tri' (interior)."""
    from fovealseg_tpu.core.grid import GridSolver, inverse_grid, pad_saliency
    from fovealseg_tpu.native.interp2d import unwarp_prediction_tri
    import jax.numpy as jnp

    solver = GridSolver(grid_h=12, grid_w=12, pad_x=4, pad_y=4, radius=4.0)
    xs = rng.standard_normal((1, 12, 12)).astype(np.float32)
    e = np.exp(xs.reshape(1, -1)); xs = (e / e.sum(-1, keepdims=True)).reshape(1, 12, 12, 1)
    hm = pad_saliency(jnp.asarray(xs), 4, 4)
    grid, _ = solver.create_grid(hm, (12, 12))
    gi, valid = inverse_grid(grid, (36, 36))
    pred = np.full((1, 12, 12, 3), 2.5, np.float32)
    out = unwarp_prediction_tri(pred, gi, valid)
    # values stay in [0, 2.5]: the reference zeroes the 4 canvas corners
    # before triangulating (models/models.py:202-211), so corner-adjacent
    # holes blend toward 0 — everywhere else the constant survives
    assert (out >= -1e-5).all() and (out <= 2.5 + 1e-5).all()
    hit = np.asarray(valid)[0]
    inner_valid = out[0][hit & (np.arange(36)[:, None] > 2) & (np.arange(36)[:, None] < 33)]
    frac_exact = np.isclose(inner_valid, 2.5, atol=1e-5).mean()
    assert frac_exact > 0.6, frac_exact


# ---------------------------------------------------------------------------
# Round-2.6: the rest of the qhull public surface (spatial/qhull.pyx __all__ =
# [Delaunay, ConvexHull, Voronoi, HalfspaceIntersection, tsearch]) plus the
# procrustes export from spatial/__init__.py's documented namespace — each
# checked against the real scipy.spatial as oracle.
# ---------------------------------------------------------------------------


def test_convex_hull_scipy_exact(rng):
    from scipy.spatial import ConvexHull as SciHull
    from fovealseg_tpu.native import ConvexHull

    for n in (5, 17, 64, 200):
        pts = rng.standard_normal((n, 2))
        ours, ref = ConvexHull(pts), SciHull(pts)
        assert set(ours.vertices) == set(ref.vertices)
        v1, v2 = list(ours.vertices), list(ref.vertices)
        v1 = v1[v1.index(v2[0]):] + v1[:v1.index(v2[0])]  # cyclic CCW match
        assert v1 == v2
        np.testing.assert_allclose(ours.volume, ref.volume)
        np.testing.assert_allclose(ours.area, ref.area)


def test_convex_hull_degenerate():
    from fovealseg_tpu.native import ConvexHull

    with np.testing.assert_raises(ValueError):
        ConvexHull(np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]))  # collinear
    with np.testing.assert_raises(ValueError):
        ConvexHull(np.array([[0.0, 0.0], [1.0, 1.0]]))


def test_voronoi_structure_vs_scipy(rng):
    from scipy.spatial import Voronoi as SciVor
    from fovealseg_tpu.native import Voronoi

    for n in (6, 25, 80):
        pts = rng.standard_normal((n, 2))
        ours, ref = Voronoi(pts), SciVor(pts)
        a = np.unique(np.round(ours.vertices, 6), axis=0)
        b = np.unique(np.round(ref.vertices, 6), axis=0)
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=1e-6)
        rp1 = set(map(tuple, np.sort(ours.ridge_points, axis=1)))
        rp2 = set(map(tuple, np.sort(ref.ridge_points, axis=1)))
        assert rp1 == rp2
        for i in range(n):
            r1 = ours.regions[ours.point_region[i]]
            r2 = ref.regions[ref.point_region[i]]
            assert (-1 in r1) == (-1 in r2)  # bounded-ness agrees per cell
            if -1 in r1:
                continue
            c1 = np.unique(np.round(ours.vertices[[x for x in r1 if x >= 0]], 6), axis=0)
            c2 = np.unique(np.round(ref.vertices[[x for x in r2 if x >= 0]], 6), axis=0)
            assert len(c1) == len(c2)
            np.testing.assert_allclose(c1, c2, atol=1e-6)


def test_voronoi_regions_sortable(rng):
    """Our Voronoi output feeds sort_vertices_of_regions-style consumers:
    every bounded region is a simple polygon around its generator (angularly
    sorted by construction)."""
    from fovealseg_tpu.native import Voronoi

    pts = rng.standard_normal((40, 2))
    v = Voronoi(pts)
    for i in range(len(pts)):
        r = v.regions[v.point_region[i]]
        if -1 in r or not r:
            continue
        centers = v.vertices[r]
        ang = np.arctan2(centers[:, 1] - pts[i, 1], centers[:, 0] - pts[i, 0])
        d = np.diff(np.concatenate([ang, ang[:1] + 2 * np.pi]))
        assert ((d >= 0) | np.isclose(d, 0)).all()


def test_halfspace_intersection_vs_scipy():
    from scipy.spatial import HalfspaceIntersection as SciHI
    from fovealseg_tpu.native import HalfspaceIntersection

    hs = np.array([
        [-1.0, 0.0, 0.0],    # x >= 0
        [0.0, -1.0, 0.0],    # y >= 0
        [1.0, 1.0, -2.0],    # x + y <= 2
        [1.0, -0.3, -1.5],   # x - 0.3y <= 1.5
        [1.0, 0.0, -10.0],   # non-binding
    ])
    ip = np.array([0.5, 0.5])
    ours, ref = HalfspaceIntersection(hs, ip), SciHI(hs, ip)
    a = np.unique(np.round(ours.intersections, 6), axis=0)
    b = np.unique(np.round(ref.intersections, 6), axis=0)
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=1e-6)
    with np.testing.assert_raises(ValueError):
        HalfspaceIntersection(hs, np.array([5.0, 5.0]))  # not interior


def test_procrustes_vs_scipy(rng):
    from scipy.spatial import procrustes as sci_proc
    from fovealseg_tpu.native import procrustes

    d1 = rng.standard_normal((12, 3))
    d2 = 3.0 * d1 @ np.linalg.qr(rng.standard_normal((3, 3)))[0] + 1.5
    m1, m2, disp = procrustes(d1, d2)
    s1, s2, sd = sci_proc(d1, d2)
    np.testing.assert_allclose(m1, s1, atol=1e-10)
    np.testing.assert_allclose(m2, s2, atol=1e-10)
    np.testing.assert_allclose(disp, sd, atol=1e-12)
    assert disp < 1e-12  # similarity transform is fully recoverable


def test_tsearch_alias(rng):
    from fovealseg_tpu.native import Delaunay, tsearch

    tri = Delaunay(rng.random((30, 2)))
    q = rng.random((64, 2)) * 1.2 - 0.1  # some outside -> -1
    np.testing.assert_array_equal(tsearch(tri, q), tri.find_simplex(q))
