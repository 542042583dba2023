"""Rotation / Slerp / voronoi-sort vs scipy.spatial.transform oracles.

Covers the transform slice of the reference's vendored spatial package
(/root/reference/spatial/transform/rotation.pyx, spatial/_voronoi.pyx)."""

import numpy as np
import pytest

sst = pytest.importorskip("scipy.spatial.transform")
scipy_spatial = pytest.importorskip("scipy.spatial")

from fovealseg_tpu.native.rotation import Rotation, Slerp
from fovealseg_tpu.native.voronoi import sort_vertices_of_regions

EULER_SEQS = ["xyz", "zyx", "xzy", "ZYX", "XYZ", "zxz", "ZXZ", "yxy"]


def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_matrix_round_trip(rng):
    q = _rand_quats(rng, 25)
    ours = Rotation.from_quat(q)
    ref = sst.Rotation.from_quat(q)
    np.testing.assert_allclose(ours.as_matrix(), ref.as_matrix(), atol=1e-12)
    # from_matrix: same rotation (quats equal up to sign)
    back = Rotation.from_matrix(ref.as_matrix())
    np.testing.assert_allclose(back.as_matrix(), ref.as_matrix(), atol=1e-10)


def test_rotvec_round_trip(rng):
    rv = rng.normal(size=(20, 3)) * 2.0
    ours = Rotation.from_rotvec(rv)
    ref = sst.Rotation.from_rotvec(rv)
    np.testing.assert_allclose(ours.as_matrix(), ref.as_matrix(), atol=1e-12)
    np.testing.assert_allclose(ours.as_rotvec(), ref.as_rotvec(), atol=1e-10)
    tiny = rng.normal(size=(5, 3)) * 1e-10
    np.testing.assert_allclose(
        Rotation.from_rotvec(tiny).as_rotvec(), tiny, atol=1e-20
    )


@pytest.mark.parametrize("seq", EULER_SEQS)
def test_euler_from_and_as(rng, seq):
    # stay clear of gimbal lock: middle angle in safe ranges
    n = 30
    a = rng.uniform(-np.pi, np.pi, (n, 3))
    proper = seq.lower()[0] == seq.lower()[2]
    a[:, 1] = rng.uniform(0.2, np.pi - 0.2, n) if proper else rng.uniform(
        -np.pi / 2 + 0.2, np.pi / 2 - 0.2, n)
    ours = Rotation.from_euler(seq, a)
    ref = sst.Rotation.from_euler(seq, a)
    np.testing.assert_allclose(ours.as_matrix(), ref.as_matrix(), atol=1e-12)
    np.testing.assert_allclose(ours.as_euler(seq), ref.as_euler(seq), atol=1e-9)


def test_euler_degrees_and_partial_seq(rng):
    a = rng.uniform(-80, 80, (8, 2))
    ours = Rotation.from_euler("xy", a, degrees=True)
    ref = sst.Rotation.from_euler("xy", a, degrees=True)
    np.testing.assert_allclose(ours.as_matrix(), ref.as_matrix(), atol=1e-12)
    single = Rotation.from_euler("z", 30.0, degrees=True)
    np.testing.assert_allclose(
        single.as_matrix(), sst.Rotation.from_euler("z", 30.0, degrees=True).as_matrix(),
        atol=1e-12,
    )


def test_apply_compose_inv_magnitude(rng):
    q = _rand_quats(rng, 12)
    v = rng.normal(size=(12, 3))
    ours, ref = Rotation.from_quat(q), sst.Rotation.from_quat(q)
    np.testing.assert_allclose(ours.apply(v), ref.apply(v), atol=1e-12)
    np.testing.assert_allclose(
        ours.apply(v, inverse=True), ref.apply(v, inverse=True), atol=1e-12
    )
    q2 = _rand_quats(rng, 12)
    ours2, ref2 = Rotation.from_quat(q2), sst.Rotation.from_quat(q2)
    np.testing.assert_allclose(
        (ours * ours2).as_matrix(), (ref * ref2).as_matrix(), atol=1e-12
    )
    np.testing.assert_allclose(ours.inv().as_matrix(), ref.inv().as_matrix(), atol=1e-12)
    np.testing.assert_allclose(ours.magnitude(), ref.magnitude(), atol=1e-12)


def test_mean_and_align_vectors(rng):
    q = _rand_quats(rng, 9)
    ours, ref = Rotation.from_quat(q), sst.Rotation.from_quat(q)
    np.testing.assert_allclose(
        ours.mean().as_matrix(), ref.mean().as_matrix(), atol=1e-9
    )
    true = sst.Rotation.from_rotvec([0.3, -0.2, 0.5])
    b = rng.normal(size=(25, 3))
    a = true.apply(b)
    est, rssd = Rotation.align_vectors(a, b)
    np.testing.assert_allclose(est.as_matrix(), true.as_matrix(), atol=1e-9)
    assert rssd < 1e-9
    est_ref, rssd_ref = sst.Rotation.align_vectors(a, b)
    np.testing.assert_allclose(est.as_matrix(), est_ref.as_matrix(), atol=1e-9)


def test_identity_random_indexing(rng):
    ident = Rotation.identity(4)
    np.testing.assert_allclose(
        ident.as_matrix(), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=0
    )
    r = Rotation.random(10, random_state=3)
    assert len(r) == 10
    np.testing.assert_allclose(
        np.linalg.det(r.as_matrix()), np.ones(10), atol=1e-12
    )
    sub = r[2:5]
    np.testing.assert_allclose(sub.as_matrix(), r.as_matrix()[2:5], atol=0)


def test_slerp_matches_scipy(rng):
    times = np.array([0.0, 1.0, 2.0, 4.0])
    key = sst.Rotation.from_quat(_rand_quats(rng, 4))
    ours = Slerp(times, Rotation.from_quat(key.as_quat()))
    ref = sst.Slerp(times, key)
    t = np.array([0.0, 0.3, 1.0, 1.7, 3.9, 4.0])
    np.testing.assert_allclose(ours(t).as_matrix(), ref(t).as_matrix(), atol=1e-10)
    with pytest.raises(ValueError):
        ours(np.array([4.1]))


def _cyclic_equal(a, b):
    """Equal as cyclic sequences in either direction."""
    if len(a) != len(b):
        return False
    a2, n = list(a) + list(a), len(a)
    fwd = any(a2[i:i + n] == list(b) for i in range(n))
    rev = any(a2[i:i + n] == list(b)[::-1] for i in range(n))
    return fwd or rev


def test_sort_vertices_of_regions_matches_scipy(rng):
    try:
        from scipy.spatial import _voronoi as scipy_voronoi
    except ImportError:
        pytest.skip("scipy _voronoi internals unavailable")
    pts = rng.normal(size=(30, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    sv = scipy_spatial.SphericalVoronoi(pts)
    # rebuild unsorted regions from the Delaunay structure like SphericalVoronoi
    tri = scipy_spatial.ConvexHull(pts)
    simplices = tri.simplices
    regions = [[] for _ in range(len(pts))]
    for si, s in enumerate(simplices):
        for v in s:
            regions[v].append(si)
    ref_regions = [list(r) for r in regions]
    scipy_voronoi.sort_vertices_of_regions(simplices, ref_regions)
    our_regions = [list(r) for r in regions]
    sort_vertices_of_regions(simplices, our_regions)
    for a, b in zip(our_regions, ref_regions):
        assert _cyclic_equal(a, b)
