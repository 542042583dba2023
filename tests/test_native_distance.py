"""Native pdist/cdist/squareform vs scipy.spatial.distance oracles.

Covers the distance slice of the reference's vendored spatial package
(/root/reference/spatial/distance.py + src/distance_wrap.c)."""

import numpy as np
import pytest

sdist = pytest.importorskip("scipy.spatial.distance")

from fovealseg_tpu.native import distance as ndist

SIMPLE_METRICS = [
    "euclidean", "sqeuclidean", "cityblock", "chebyshev", "cosine",
    "correlation", "braycurtis", "canberra",
]


@pytest.mark.parametrize("metric", SIMPLE_METRICS)
def test_pdist_matches_scipy(rng, metric):
    X = rng.normal(size=(23, 7))
    np.testing.assert_allclose(
        ndist.pdist(X, metric), sdist.pdist(X, metric), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("metric", SIMPLE_METRICS)
def test_cdist_matches_scipy(rng, metric):
    XA = rng.normal(size=(11, 5))
    XB = rng.normal(size=(17, 5))
    np.testing.assert_allclose(
        ndist.cdist(XA, XB, metric), sdist.cdist(XA, XB, metric),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.parametrize("p", [1.0, 2.0, 3.5])
def test_minkowski_p_matches_scipy(rng, p):
    X = rng.normal(size=(15, 4))
    np.testing.assert_allclose(
        ndist.pdist(X, "minkowski", p=p), sdist.pdist(X, "minkowski", p=p),
        rtol=1e-12,
    )


def test_hamming_jaccard_on_binary(rng):
    X = (rng.uniform(size=(20, 9)) > 0.5).astype(np.float64)
    for metric in ["hamming", "jaccard"]:
        np.testing.assert_allclose(
            ndist.pdist(X, metric), sdist.pdist(X, metric), rtol=1e-12
        )


def test_seuclidean_default_and_explicit_V(rng):
    X = rng.normal(size=(12, 6))
    np.testing.assert_allclose(
        ndist.pdist(X, "seuclidean"), sdist.pdist(X, "seuclidean"), rtol=1e-12
    )
    V = rng.uniform(0.5, 2.0, size=6)
    np.testing.assert_allclose(
        ndist.pdist(X, "seuclidean", V=V), sdist.pdist(X, "seuclidean", V=V),
        rtol=1e-12,
    )


def test_mahalanobis_matches_scipy(rng):
    X = rng.normal(size=(30, 4))
    np.testing.assert_allclose(
        ndist.pdist(X, "mahalanobis"), sdist.pdist(X, "mahalanobis"), rtol=1e-9
    )
    VI = np.linalg.inv(np.cov(X.T))
    np.testing.assert_allclose(
        ndist.cdist(X[:5], X[5:12], "mahalanobis", VI=VI),
        sdist.cdist(X[:5], X[5:12], "mahalanobis", VI=VI),
        rtol=1e-9,
    )


def test_squareform_round_trip(rng):
    X = rng.normal(size=(14, 3))
    y = ndist.pdist(X, "euclidean")
    D = ndist.squareform(y)
    np.testing.assert_allclose(D, sdist.squareform(y))
    np.testing.assert_allclose(ndist.squareform(D), y)
    assert ndist.num_obs_y(y) == 14
    assert ndist.num_obs_dm(D) == 14
    assert ndist.is_valid_dm(D)
    assert ndist.is_valid_y(y)


def test_two_vector_functions(rng):
    u, v = rng.normal(size=7), rng.normal(size=7)
    assert np.isclose(ndist.euclidean(u, v), sdist.euclidean(u, v))
    assert np.isclose(ndist.cosine(u, v), sdist.cosine(u, v))
    assert np.isclose(ndist.cityblock(u, v), sdist.cityblock(u, v))
    assert np.isclose(ndist.minkowski(u, v, p=3), sdist.minkowski(u, v, p=3))


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        ndist.pdist(np.zeros((3, 2)), "nope")


def test_squareform_force_validation():
    # force='tovector' on a 1-D condensed vector must raise (scipy behavior),
    # not silently return a matrix
    with pytest.raises(ValueError):
        ndist.squareform(np.array([1.0, 2.0, 3.0]), force="tovector")
    with pytest.raises(ValueError):
        ndist.squareform(np.zeros((3, 3)), force="tomatrix")


def test_jaccard_nonbinary_booleanizes(rng):
    """scipy jaccard booleanizes (u!=0, v!=0) BEFORE comparing — two
    different nonzero values are not a disagreement."""
    u = np.array([[0.5, 0.0, 0.3], [0.2, 0.0, 0.3]])
    np.testing.assert_allclose(ndist.pdist(u, "jaccard"), sdist.pdist(u, "jaccard"))
    X = rng.normal(size=(9, 6)) * (rng.random(size=(9, 6)) > 0.4)
    np.testing.assert_allclose(ndist.pdist(X, "jaccard"), sdist.pdist(X, "jaccard"))
    np.testing.assert_allclose(
        ndist.cdist(X[:4], X[4:], "jaccard"), sdist.cdist(X[:4], X[4:], "jaccard")
    )
