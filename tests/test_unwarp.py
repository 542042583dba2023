"""Inverse-warp hole filling: JFA nearest vs brute-force nearest oracle."""

import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.unwarp import (
    fill_values_nearest,
    fill_values_splat,
    nearest_seed_jfa,
    unwarp_prediction,
)


def _brute_nearest(valid):
    h, w = valid.shape
    ys, xs = np.nonzero(valid)
    out = np.zeros((h, w), dtype=np.int64)
    for i in range(h):
        for j in range(w):
            d = (ys - i) ** 2 + (xs - j) ** 2
            k = int(np.argmin(d))
            out[i, j] = ys[k] * w + xs[k]
    return out


def test_jfa_matches_brute_force_distance(rng):
    valid = rng.uniform(0, 1, (24, 24)) > 0.9
    valid[0, 0] = True  # ensure non-empty
    jfa = np.asarray(nearest_seed_jfa(jnp.asarray(valid[None])))[0]
    ref = _brute_nearest(valid)
    ys, xs = np.mgrid[0:24, 0:24]

    def d2(flat):
        return (flat // 24 - ys) ** 2 + (flat % 24 - xs) ** 2

    # JFA may tie-break differently but the *distance* must match exactly
    # (1+JFA variant is exact on these sizes for the vast majority; allow a
    # tiny slack of 1 pixel^2 on rare cells)
    dd_jfa = d2(jfa)
    dd_ref = d2(ref)
    assert (dd_jfa == dd_ref).mean() > 0.98
    assert np.abs(dd_jfa - dd_ref).max() <= 2


def test_fill_values_nearest_exact_on_valid(rng):
    vals = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    valid = rng.uniform(0, 1, (1, 16, 16)) > 0.8
    valid[0, 5, 5] = True
    out = np.asarray(fill_values_nearest(jnp.asarray(vals), jnp.asarray(valid)))
    # valid pixels keep their value
    np.testing.assert_array_equal(out[valid], vals[valid])
    # filled pixels take a value present among the valid set
    valid_vals = set(np.round(vals[0][valid[0]][:, 0], 5))
    for v in np.round(out[0][~valid[0]][:, 0], 5):
        assert v in valid_vals


def test_fill_values_splat_preserves_valid_and_fills(rng):
    vals = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    valid = np.zeros((1, 16, 16), dtype=bool)
    valid[0, ::4, ::4] = True
    out = np.asarray(fill_values_splat(jnp.asarray(vals), jnp.asarray(valid)))
    np.testing.assert_array_equal(out[valid], vals[valid])
    assert not np.isnan(out).any()


def test_unwarp_prediction_constant_field(rng):
    """A constant prediction must unwarp to the same constant everywhere."""
    pred = np.full((1, 8, 8, 4), 3.25, dtype=np.float32)
    grid_inv = np.full((1, 32, 32, 2), np.nan, dtype=np.float32)
    valid = np.zeros((1, 32, 32), dtype=bool)
    # scatter a few valid entries pointing at random task coords
    for _ in range(40):
        i, j = rng.integers(0, 32, 2)
        # keep all 4 bilinear taps in-bounds: |g| <= 0.7 on an 8-wide map
        # avoids torch's zero-padding bleed at the border
        grid_inv[0, i, j] = rng.uniform(-0.7, 0.7, 2)
        valid[0, i, j] = True
    for interp in ("nearest", "BI"):
        out = np.asarray(
            unwarp_prediction(jnp.asarray(pred), jnp.asarray(grid_inv), jnp.asarray(valid), interp)
        )
        np.testing.assert_allclose(out, 3.25, rtol=1e-5)
