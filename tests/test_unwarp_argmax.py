"""unwarp_argmax_fast == argmax(unwarp_prediction_fast) — exactness of the
argmax-only serving path (argmax commutes with the row-gather inverse warp)."""

import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.grid import inverse_grid_index
from fovealseg_tpu.core.unwarp import (
    unwarp_argmax_fast,
    unwarp_argmax_scatter,
    unwarp_prediction_fast,
)


def _random_grid(rng, b, th, tw):
    # monotone-ish jittered grid in [-1, 1] like the clamped forward grid
    gx = np.sort(rng.uniform(-1, 1, (b, th, tw)), axis=2)
    gy = np.sort(rng.uniform(-1, 1, (b, th, tw)), axis=1)
    return jnp.asarray(np.stack([gx, gy], axis=-1), jnp.float32)


def test_argmax_path_matches_full_path():
    rng = np.random.default_rng(304)
    b, th, tw, c = 2, 12, 12, 7
    seg_hw = (48, 48)
    grid = _random_grid(rng, b, th, tw)
    task_idx, valid = inverse_grid_index(grid, seg_hw)
    pred = jnp.asarray(rng.normal(size=(b, th, tw, c)), jnp.float32)
    full = unwarp_prediction_fast(pred, task_idx, valid)
    fast = unwarp_argmax_fast(pred, task_idx, valid)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(full), axis=-1), np.asarray(fast)
    )
    # gather-free scatter formulation agrees too (production serving path)
    scat = unwarp_argmax_scatter(pred, grid, seg_hw)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(scat))


def test_argmax_path_with_runtime_rounds():
    from fovealseg_tpu.core.unwarp import jfa_rounds_from_grid

    rng = np.random.default_rng(7)
    b, th, tw, c = 1, 10, 10, 5
    seg_hw = (40, 40)
    grid = _random_grid(rng, b, th, tw)
    task_idx, valid = inverse_grid_index(grid, seg_hw)
    pred = jnp.asarray(rng.normal(size=(b, th, tw, c)), jnp.float32)
    rounds = jfa_rounds_from_grid(grid, seg_hw)
    full = unwarp_prediction_fast(pred, task_idx, valid, None, rounds)
    fast = unwarp_argmax_fast(pred, task_idx, valid, None, rounds)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(full), axis=-1), np.asarray(fast)
    )
