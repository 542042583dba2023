"""grid_sample parity vs torch.nn.functional.grid_sample (CPU oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from fovealseg_tpu.core.warp import grid_sample


def _torch_grid_sample(img_nhwc, grid, mode):
    t = torch.from_numpy(img_nhwc).permute(0, 3, 1, 2)
    g = torch.from_numpy(grid)
    y = TF.grid_sample(t, g, mode=mode, padding_mode="zeros", align_corners=False)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_random_grid(rng, mode):
    img = rng.standard_normal((2, 33, 47, 3)).astype(np.float32)
    # in-range and slightly out-of-range coords; avoid exact .5 rounding ties
    grid = (rng.uniform(-1.2, 1.2, (2, 20, 24, 2)) + 1e-4).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode))
    ref = _torch_grid_sample(img, grid, mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity(rng):
    """An align_corners=False identity grid reproduces the image (interior)."""
    h = w = 16
    img = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = (2 * xs + 1) / w - 1
    gy = (2 * ys + 1) / h - 1
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_grid_sample_zero_padding(rng):
    img = np.ones((1, 8, 8, 1), dtype=np.float32)
    grid = np.full((1, 4, 4, 2), -3.0, dtype=np.float32)  # far out of range
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_packed_matches_taps_exactly(rng):
    """The single-gather packed bilinear path is bit-identical to the 4-tap
    reference path, including out-of-range coords and NaN propagation."""
    from fovealseg_tpu.core.warp import _grid_sample_packed, _grid_sample_taps

    img = rng.standard_normal((2, 33, 47, 3)).astype(np.float32)
    grid = rng.uniform(-1.6, 1.6, (2, 19, 21, 2)).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 1, 0] = [-1.2, 0.3]  # one tap off-canvas
    grid[0, 1, 1] = [0.3, 1.5]
    grid[1, 2, 3] = [np.nan, 0.0]
    a = np.asarray(_grid_sample_taps(jnp.asarray(img), jnp.asarray(grid)))
    b = np.asarray(_grid_sample_packed(jnp.asarray(img), jnp.asarray(grid)))
    nan_a, nan_b = np.isnan(a), np.isnan(b)
    np.testing.assert_array_equal(nan_a, nan_b)
    np.testing.assert_array_equal(a[~nan_a], b[~nan_b])
    assert nan_a[1, 2, 3].all()


def test_nearest_boundary_rounding_cuda_convention():
    """At a clamped grid coord of exactly -1.0 the unnormalized index is
    -0.5; CUDA torch (::round, half away from zero) maps it to -1 ->
    out-of-bounds -> zero padding. The reference's published runs are CUDA,
    so that convention is pinned here (CPU torch would round-half-even to 0
    and return the edge pixel instead)."""
    img = np.full((1, 6, 6, 1), 7.0, dtype=np.float32)
    grid = np.zeros((1, 1, 3, 2), dtype=np.float32)
    grid[0, 0, 0] = [-1.0, 0.0]   # ix = -0.5 exactly -> OOB under CUDA rounding
    grid[0, 0, 1] = [-0.99, 0.0]  # ix > -0.5 -> in bounds (edge pixel)
    grid[0, 0, 2] = [1.0, 0.0]    # ix = W - 0.5 -> rounds to W -> OOB
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), mode="nearest"))
    assert out[0, 0, 0, 0] == 0.0
    assert out[0, 0, 1, 0] == 7.0
    assert out[0, 0, 2, 0] == 0.0
