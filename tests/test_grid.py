"""Grid-solver correctness: separable-conv solver vs a dense torch oracle.

The oracle implements the Recasens "learn to downsample" Eq. 3 directly with a
dense 2-D Gaussian conv (as the reference does); our solver must match it to
float tolerance while doing two 1-D matmuls instead.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from fovealseg_tpu.core.grid import (
    GridSolver,
    inverse_grid,
    make_gaussian_1d,
    pad_saliency,
)


def _oracle_grid(xs: np.ndarray, solver: GridSolver) -> np.ndarray:
    """Dense-conv torch oracle of the raw grid solve (no upsampling).

    xs: [B, gh, gw] softmaxed saliency. Returns [B, gh, gw, 2] (x, y).
    """
    px, py = solver.pad_x, solver.pad_y
    g = make_gaussian_1d(2 * px + 1, fwhm=solver.radius)
    k2 = np.outer(g, g).astype(np.float32)[None, None]
    kernel = TF.interpolate(torch.from_numpy(k2), size=(2 * px + 1, 2 * py + 1),
                            mode="bilinear").numpy()[0, 0]
    kt = torch.from_numpy(kernel)[None, None]

    t = torch.from_numpy(xs)[:, None]  # [B,1,gh,gw]
    t = TF.pad(t, (py, py, px, px), mode="replicate")
    u, v = solver.p_basis()
    p = TF.conv2d(t, kt)
    fu = TF.conv2d(t * torch.from_numpy(u)[None, None], kt)
    fv = TF.conv2d(t * torch.from_numpy(v)[None, None], kt)
    gx = torch.clamp(fu / p * 2 - 1, -1, 1)
    gy = torch.clamp(fv / p * 2 - 1, -1, 1)
    return torch.cat([gx, gy], dim=1).permute(0, 2, 3, 1).numpy()


def _softmax_saliency(rng, b, h, w):
    xs = rng.standard_normal((b, h, w)).astype(np.float32)
    e = np.exp(xs.reshape(b, -1))
    return (e / e.sum(-1, keepdims=True)).reshape(b, h, w)


def test_solver_matches_dense_oracle_square(rng):
    solver = GridSolver(grid_h=32, grid_w=32, pad_x=9, pad_y=9, radius=9.0)
    xs = _softmax_saliency(rng, 2, 32, 32)
    hm = pad_saliency(jnp.asarray(xs)[..., None], solver.pad_x, solver.pad_y)
    ours = np.asarray(solver.solve(hm))
    ref = _oracle_grid(xs, solver)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_solver_matches_dense_oracle_aspect(rng):
    # non-square saliency + stretched gaussian (gaussian_ap path)
    solver = GridSolver(grid_h=16, grid_w=32, pad_x=7, pad_y=14, radius=7.0)
    xs = _softmax_saliency(rng, 1, 16, 32)
    hm = pad_saliency(jnp.asarray(xs)[..., None], solver.pad_x, solver.pad_y)
    ours = np.asarray(solver.solve(hm))
    ref = _oracle_grid(xs, solver)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_uniform_saliency_gives_near_identity_grid():
    """Uniform saliency must produce an (approximately) uniform grid: the
    Gaussian-weighted centroid of uniform mass is the pixel itself."""
    solver = GridSolver(grid_h=40, grid_w=40, pad_x=12, pad_y=12, radius=12.0)
    xs = jnp.full((1, 40, 40, 1), 1.0 / (40 * 40), dtype=jnp.float32)
    hm = pad_saliency(xs, solver.pad_x, solver.pad_y)
    grid = np.asarray(solver.solve(hm))
    lin = (np.arange(40) / 39.0) * 2 - 1
    np.testing.assert_allclose(grid[0, 20, :, 0], lin, atol=5e-3)
    np.testing.assert_allclose(grid[0, :, 20, 1], lin, atol=5e-3)


def test_saliency_peak_attracts_samples():
    """A saliency peak pulls sample coordinates toward it (foveation)."""
    solver = GridSolver(grid_h=40, grid_w=40, pad_x=12, pad_y=12, radius=12.0)
    xs = np.full((1, 40, 40, 1), 1e-6, dtype=np.float32)
    xs[0, 10, 10, 0] = 1.0
    hm = pad_saliency(jnp.asarray(xs), solver.pad_x, solver.pad_y)
    grid = np.asarray(solver.solve(hm))
    # peak at row 10 / col 10 -> normalized coord (10/39*2-1) ~= -0.487
    peak = 10 / 39.0 * 2 - 1
    # far corner samples are dragged toward the peak
    assert abs(grid[0, 35, 35, 0] - peak) < abs(35 / 39.0 * 2 - 1 - peak)
    assert abs(grid[0, 35, 35, 1] - peak) < abs(35 / 39.0 * 2 - 1 - peak)


def test_inverse_grid_roundtrip():
    """Where the inverse grid is valid, sampling it at the forward-grid's
    integer target recovers the task pixel's normalized coordinates."""
    solver = GridSolver(grid_h=16, grid_w=16, pad_x=5, pad_y=5, radius=5.0)
    rng = np.random.default_rng(0)
    xs = _softmax_saliency(rng, 1, 16, 16)
    hm = pad_saliency(jnp.asarray(xs)[..., None], solver.pad_x, solver.pad_y)
    grid, _ = solver.create_grid(hm, (16, 16))
    seg = (64, 64)
    ginv, valid = inverse_grid(grid, seg)
    g = np.asarray(grid)
    gi = np.asarray(ginv)
    val = np.asarray(valid)
    hits = 0
    for i in range(16):
        for j in range(16):
            u = int(np.floor((g[0, i, j, 0] + 1) / 2 * (seg[1] - 1)))
            v = int(np.floor((g[0, i, j, 1] + 1) / 2 * (seg[0] - 1)))
            assert val[0, v, u]
            # last-write-wins: the stored coords correspond to SOME task pixel
            # hitting (v,u); check self-consistency
            tj = round((gi[0, v, u, 0] + 1) / 2 * 16 - 0.0)
            ti = round((gi[0, v, u, 1] + 1) / 2 * 16 - 0.0)
            u2 = int(np.floor((g[0, int(ti), int(tj), 0] + 1) / 2 * (seg[1] - 1)))
            v2 = int(np.floor((g[0, int(ti), int(tj), 1] + 1) / 2 * (seg[0] - 1)))
            assert (u2, v2) == (u, v)
            hits += 1
    assert hits == 256
    # holes are NaN
    assert np.isnan(gi[0][~val[0]]).all()
