"""Exactness of the fast inverse-warp path vs the generic reference path."""

import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.grid import GridSolver, inverse_grid, inverse_grid_index, pad_saliency
from fovealseg_tpu.core.unwarp import (
    halfpixel_avg,
    nearest_seed_jfa,
    nearest_seed_payload,
    unwarp_prediction,
    unwarp_prediction_fast,
)
from fovealseg_tpu.core.warp import grid_sample


def _solver_grid(rng, b=2, n=16):
    solver = GridSolver(grid_h=n, grid_w=n, pad_x=5, pad_y=5, radius=5.0)
    xs = rng.standard_normal((b, n, n)).astype(np.float32)
    e = np.exp(xs.reshape(b, -1))
    xs = (e / e.sum(-1, keepdims=True)).reshape(b, n, n, 1)
    hm = pad_saliency(jnp.asarray(xs), solver.pad_x, solver.pad_y)
    grid, _ = solver.create_grid(hm, (n, n))
    return grid


def test_halfpixel_avg_matches_grid_sample(rng):
    """Sampling at (j-0.5, i-0.5) == zero-padded 2x2 average."""
    pred = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    jj, ii = np.meshgrid(np.arange(8), np.arange(8))
    gx = jj / 8 * 2 - 1.0  # unnormalizes to j - 0.5
    gy = ii / 8 * 2 - 1.0
    grid = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
    ref = np.asarray(grid_sample(pred, grid))
    fast = np.asarray(halfpixel_avg(pred))
    np.testing.assert_allclose(fast, ref, rtol=1e-6, atol=1e-6)


def test_payload_jfa_matches_seed_gather(rng):
    valid = rng.uniform(0, 1, (2, 24, 24)) > 0.9
    valid[:, 0, 0] = True
    payload = rng.integers(0, 1000, (2, 24, 24)).astype(np.int32)
    seeds = np.asarray(nearest_seed_jfa(jnp.asarray(valid)))
    via_gather = np.take_along_axis(
        payload.reshape(2, -1), seeds.reshape(2, -1), axis=1
    ).reshape(2, 24, 24)
    direct = np.asarray(nearest_seed_payload(jnp.asarray(valid), jnp.asarray(payload)))
    np.testing.assert_array_equal(direct, via_gather)


def test_fast_unwarp_equals_generic_nearest(rng):
    grid = _solver_grid(rng)
    pred = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    seg = (48, 48)
    gi, valid = inverse_grid(grid, seg)
    ref = np.asarray(unwarp_prediction(pred, gi, valid, interp="nearest"))
    tidx, valid2 = inverse_grid_index(grid, seg)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid2))
    fast = np.asarray(unwarp_prediction_fast(pred, tidx, valid2))
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)
