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


# ---- RotationSpline + rotation groups (spatial/transform tail surface) ----


def _ref_spline():
    from scipy.spatial.transform import RotationSpline as SciSpline

    return SciSpline


def test_rotation_spline_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as SciRot

    from fovealseg_tpu.native.rotation import RotationSpline

    times = np.array([0.0, 10.0, 20.0, 40.0, 70.0])
    angles = rng.uniform(-60, 60, (5, 3))
    ours = RotationSpline(times, Rotation.from_euler("XYZ", angles, degrees=True))
    ref = _ref_spline()(times, SciRot.from_euler("XYZ", angles, degrees=True))

    t = np.linspace(0.0, 70.0, 57)
    np.testing.assert_allclose(
        ours(t).as_quat() * np.sign(ours(t).as_quat()[:, 3:]),
        ref(t).as_quat() * np.sign(ref(t).as_quat()[:, 3:]),
        atol=1e-10,
    )
    np.testing.assert_allclose(ours(t, 1), ref(t, 1), atol=1e-10)
    np.testing.assert_allclose(ours(t, 2), ref(t, 2), atol=1e-10)
    # knot interpolation is exact; scalar-time call returns a single rotation
    np.testing.assert_allclose(
        ours(10.0).as_matrix(),
        SciRot.from_euler("XYZ", angles[1], degrees=True).as_matrix(),
        atol=1e-12,
    )


def test_rotation_spline_two_knots_matches_scipy():
    from scipy.spatial.transform import Rotation as SciRot

    from fovealseg_tpu.native.rotation import RotationSpline

    times = [0.0, 4.0]
    quats = Rotation.from_euler("xyz", [[10, 20, 30], [-40, 10, 110]],
                                degrees=True).as_quat()
    ours = RotationSpline(times, Rotation.from_quat(quats))
    ref = _ref_spline()([0.0, 4.0], SciRot.from_quat(quats))
    t = np.linspace(0, 4, 17)
    np.testing.assert_allclose(ours(t, 1), ref(t, 1), atol=1e-12)
    np.testing.assert_allclose(
        ours(t).as_matrix(), ref(t).as_matrix(), atol=1e-12)


def test_rotation_spline_validation():
    from fovealseg_tpu.native.rotation import RotationSpline

    r = Rotation.from_euler("xyz", [[0, 0, 0], [10, 0, 0]], degrees=True)
    with pytest.raises(ValueError):
        RotationSpline([0.0, 0.0], r)  # non-increasing
    with pytest.raises(ValueError):
        RotationSpline([0.0], r)  # length mismatch
    with pytest.raises(ValueError):
        RotationSpline([0.0, 1.0], r)(0.5, order=3)


def _canon_set(quats):
    q = np.asarray(quats, float)
    q = q * np.where(q[:, 3:] < 0, -1.0, 1.0)
    q = q * np.where((np.abs(q[:, 3:]) < 1e-9) & (q[:, 2:3] < 0), -1.0, 1.0)
    q = q * np.where(
        (np.abs(q[:, 3:]) < 1e-9) & (np.abs(q[:, 2:3]) < 1e-9) & (q[:, 1:2] < 0),
        -1.0, 1.0)
    q = q * np.where(
        (np.abs(q[:, 2:]) < 1e-9).all(1, keepdims=True) & (q[:, :1] < 0) &
        (np.abs(q[:, 1:2]) < 1e-9), -1.0, 1.0)
    return {tuple(np.round(row, 6)) for row in q}


@pytest.mark.parametrize("group,order", [
    ("I", 60), ("O", 24), ("T", 12), ("C1", 1), ("C4", 4), ("C7", 7),
    ("D1", 2), ("D3", 6), ("D5", 10),
])
def test_create_group_matches_scipy(group, order):
    from scipy.spatial.transform import Rotation as SciRot

    ours = Rotation.create_group(group)
    ref = SciRot.create_group(group)
    assert len(ours) == len(ref) == order
    assert _canon_set(ours.as_quat()) == _canon_set(ref.as_quat()), group
    # closure: every pairwise product stays in the group
    got = ours.as_quat()
    all_prod = []
    for i in range(len(ours)):
        all_prod.append((ours[i] * ours).as_quat())
    assert _canon_set(np.vstack(all_prod)) == _canon_set(got)


@pytest.mark.parametrize("axis", ["x", "y", "z"])
def test_create_group_axes_match_scipy(axis):
    from scipy.spatial.transform import Rotation as SciRot

    for g in ("C5", "D4"):
        ours = Rotation.create_group(g, axis=axis)
        ref = SciRot.create_group(g, axis=axis)
        assert _canon_set(ours.as_quat()) == _canon_set(ref.as_quat()), (g, axis)


def test_create_group_validation():
    with pytest.raises(ValueError):
        Rotation.create_group("Q3")
    with pytest.raises(ValueError):
        Rotation.create_group("C0")
    with pytest.raises(ValueError):
        Rotation.create_group("I", axis="w")
    with pytest.raises(ValueError):
        Rotation.create_group(5)
