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


def test_grid_derived_rounds_bound_is_sufficient(rng):
    """jfa_rounds_from_grid: the grid-geometry bound covers every hole — the
    reduced dynamic-rounds JFA output equals the full chain (VERDICT r1#3)."""
    import math

    from fovealseg_tpu.core.unwarp import jfa_rounds_from_grid

    grid = _solver_grid(rng, b=2, n=16)
    seg_hw = (64, 64)
    task_idx, valid = inverse_grid_index(grid, seg_hw)
    rounds = int(jfa_rounds_from_grid(grid, seg_hw))
    full = max(1, math.ceil(math.log2(max(seg_hw))))
    assert 2 <= rounds <= full

    # seed-index equality is too strict (equidistant ties may break
    # differently between chain lengths, as they may vs scipy); the bound is
    # sufficient iff every pixel's chosen seed is at the true optimal distance
    got = np.asarray(nearest_seed_jfa(valid, num_iters=rounds))
    h, w = seg_hw
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    v = np.asarray(valid)
    for b in range(v.shape[0]):
        ys, xs_ = np.nonzero(v[b])
        pts = np.stack([ys, xs_], 1).astype(np.float64)
        sy, sx = got[b] // w, got[b] % w
        chosen = np.sqrt((sy - rr) ** 2 + (sx - cc) ** 2)
        # brute-force optimal distances
        d2 = ((rr[..., None] - pts[:, 0]) ** 2 + (cc[..., None] - pts[:, 1]) ** 2).min(-1)
        np.testing.assert_allclose(chosen, np.sqrt(d2), atol=1e-6)


def test_pallas_dynamic_rounds_matches_static(rng):
    """The Pallas kernel honors a traced `rounds` scalar (interpret mode)."""
    from fovealseg_tpu.ops.pallas_jfa import nearest_payload_pallas

    grid = _solver_grid(rng, b=1, n=16)
    task_idx, valid = inverse_grid_index(grid, (64, 64))
    ref = np.asarray(nearest_payload_pallas(valid, task_idx, num_iters=6, interpret=True))
    dyn = np.asarray(
        nearest_payload_pallas(valid, task_idx, interpret=True, rounds=jnp.int32(6))
    )
    np.testing.assert_array_equal(dyn, ref)


def test_bf16_gather_flag_within_tolerance(rng):
    # TPU.scoremap_gather_bf16: same values to bf16 rounding, f32 container
    grid = _solver_grid(rng)
    pred = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    tidx, valid = inverse_grid_index(grid, (48, 48))
    exact = np.asarray(unwarp_prediction_fast(pred, tidx, valid))
    rounded = unwarp_prediction_fast(pred, tidx, valid, gather_bf16=True)
    assert rounded.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(rounded), exact, atol=2e-2)
    assert np.abs(np.asarray(rounded) - exact).max() > 0  # actually rounded
