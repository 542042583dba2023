"""Native k-d tree vs scipy.spatial.cKDTree oracles.

Covers the ckdtree slice of the reference's vendored spatial package
(/root/reference/spatial/ckdtree/src/*.cxx)."""

import numpy as np
import pytest

scipy_spatial = pytest.importorskip("scipy.spatial")

from fovealseg_tpu.native.kdtree import KDTree, cKDTree


@pytest.mark.parametrize("d", [2, 3, 5])
def test_query_knn_matches_scipy(rng, d):
    pts = rng.uniform(0, 10, (200, d))
    q = rng.uniform(-1, 11, (50, d))
    ours = KDTree(pts)
    ref = scipy_spatial.cKDTree(pts)
    for k in [1, 4]:
        dm, im = ours.query(q, k=k)
        dr, ir = ref.query(q, k=k)
        np.testing.assert_allclose(dm, dr, rtol=1e-12)
        # indices may differ on exact ties; distances settle it
        np.testing.assert_allclose(
            np.linalg.norm(pts[im] - (q[:, None] if k > 1 else q), axis=-1),
            dr, rtol=1e-12,
        )


@pytest.mark.parametrize("p", [1.0, 2.0, np.inf])
def test_query_minkowski_p(rng, p):
    pts = rng.uniform(0, 5, (120, 3))
    q = rng.uniform(0, 5, (30, 3))
    dm, _ = KDTree(pts).query(q, k=3, p=p)
    dr, _ = scipy_spatial.cKDTree(pts).query(q, k=3, p=p)
    np.testing.assert_allclose(dm, dr, rtol=1e-12)


def test_query_single_point_shape(rng):
    pts = rng.uniform(0, 1, (40, 2))
    t = KDTree(pts)
    d1, i1 = t.query(pts[3], k=1)
    assert np.isscalar(float(d1)) and d1 == 0.0 and i1 == 3


def test_query_ball_point_matches_scipy(rng):
    pts = rng.uniform(0, 10, (150, 2))
    q = rng.uniform(0, 10, (20, 2))
    ours = KDTree(pts).query_ball_point(q, r=1.5)
    ref = scipy_spatial.cKDTree(pts).query_ball_point(q, r=1.5)
    for a, b in zip(ours, ref):
        assert sorted(a) == sorted(b)


def test_query_pairs_matches_scipy(rng):
    pts = rng.uniform(0, 6, (90, 2))
    ours = KDTree(pts).query_pairs(0.8)
    ref = scipy_spatial.cKDTree(pts).query_pairs(0.8)
    assert ours == ref


def test_count_neighbors_matches_scipy(rng):
    a = rng.uniform(0, 4, (70, 3))
    b = rng.uniform(0, 4, (55, 3))
    ta, tb = KDTree(a), KDTree(b)
    ra, rb = scipy_spatial.cKDTree(a), scipy_spatial.cKDTree(b)
    for r in [0.5, 1.0, 2.5]:
        assert ta.count_neighbors(tb, r) == ra.count_neighbors(rb, r)
    rs = np.array([0.3, 1.2])
    np.testing.assert_array_equal(
        ta.count_neighbors(tb, rs), ra.count_neighbors(rb, rs)
    )


def test_missing_neighbors_sentinel(rng):
    pts = rng.uniform(0, 1, (3, 2))
    d, i = KDTree(pts).query(np.zeros((1, 2)), k=5)
    assert np.isinf(d[0, 3:]).all() and (i[0, 3:] == 3).all()


def test_alias():
    assert cKDTree is KDTree


def test_query_ball_tree_matches_scipy(rng):
    sp = pytest.importorskip("scipy.spatial")
    a = rng.standard_normal((60, 3))
    b = rng.standard_normal((45, 3))
    ours_a, ours_b = KDTree(a), KDTree(b)
    ref_a, ref_b = sp.cKDTree(a), sp.cKDTree(b)
    for r, p in [(0.8, 2.0), (1.2, 1.0), (0.9, np.inf), (0.0, 2.0)]:
        ours = ours_a.query_ball_tree(ours_b, r, p=p)
        ref = ref_a.query_ball_tree(ref_b, r, p=p)
        assert [sorted(x) for x in ours] == [sorted(x) for x in ref], (r, p)


def test_sparse_distance_matrix_matches_scipy(rng):
    sp = pytest.importorskip("scipy.spatial")
    a = rng.standard_normal((40, 4))
    b = rng.standard_normal((55, 4))
    ours_a, ours_b = KDTree(a), KDTree(b)
    ref_a, ref_b = sp.cKDTree(a), sp.cKDTree(b)
    for p in (2.0, 1.0, 3.0, np.inf):
        ours = ours_a.sparse_distance_matrix(ours_b, 1.1, p=p)
        ref = ref_a.sparse_distance_matrix(ref_b, 1.1, p=p)
        assert ours.shape == ref.shape
        ko, kr = set(dict(ours)), set(dict(ref))
        assert ko == kr, f"key sets differ at p={p}"
        for k in kr:
            np.testing.assert_allclose(ours[k], ref[k], rtol=1e-12, err_msg=str(p))
    # dict + coo output types
    d = ours_a.sparse_distance_matrix(ours_b, 1.1, output_type="dict")
    rd = ref_a.sparse_distance_matrix(ref_b, 1.1, output_type="dict")
    assert set(d) == set(rd)
    coo = ours_a.sparse_distance_matrix(ours_b, 1.1, output_type="coo_matrix")
    np.testing.assert_allclose(
        coo.toarray(),
        ref_a.sparse_distance_matrix(ref_b, 1.1, output_type="coo_matrix").toarray(),
        rtol=1e-12,
    )
    # empty result keeps shape/type
    empty = ours_a.sparse_distance_matrix(ours_b, 0.0, output_type="coo_matrix")
    assert empty.nnz == 0 and empty.shape == (40, 55)
