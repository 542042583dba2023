"""Standalone deformed sampler (DynamicFocus variant), TPU-native.

Rebuild of /root/reference/DynamicFocus/d_model/nn_B0_deformed_sampler.py —
an independent formulation of the grid solver: the sampling grid is the
*Gaussian-window expectation of coordinates* weighted by the deformation map
(unfold + einsum at nn_B0:29-78), plus an integer grid snap
(``int_rount_scale_grid``:81-99) and a scatter + nearest-fill inverse
(``deformed_unsampler``:115-153, scipy EDT).

TPU-native design: the reference materializes a [B, HS, WS, K, K] unfold
(O(K^2) memory blowup); here the windowed expectation reduces to three
separable Gaussian convolutions, because the window-sum of coordinates is a
closed form (sum of coords over a symmetric window centered at i = K^2 * i):

  E[coord] = (conv(dm * coord, k) + eps * K^2 * center) /
             (conv(dm, k) + eps * K^2)

with the reference's per-element eps regularization folded in exactly. The
inverse uses the on-device JFA nearest fill instead of the reference's
CPU round-trip through scipy's EDT.

Note the channel convention here is (row, col) — the *opposite* of
F.grid_sample's (x, y) — matching the reference module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.unwarp import fill_values_nearest


def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    """1-D factor of nn_B0's normalized 2-D Gaussian (kernel = outer(g, g) /
    sum; separable because exp(-(x^2+y^2)) factorizes)."""
    coords = np.linspace(-(size // 2), size // 2, size)
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _sep_conv_valid(x: jnp.ndarray, g: np.ndarray) -> jnp.ndarray:
    """[B, HP, WP, C] -> [B, H, W, C] valid separable conv with 1-D kernel g
    on both axes (dense banded matmuls, MXU-friendly)."""
    k = len(g)
    hp, wp = x.shape[1], x.shape[2]
    h, w = hp - k + 1, wp - k + 1
    mh = np.zeros((h, hp), dtype=np.float32)
    for r in range(h):
        mh[r, r : r + k] = g
    mw = np.zeros((w, wp), dtype=np.float32)
    for r in range(w):
        mw[r, r : r + k] = g
    hp_prec = jax.lax.Precision.HIGHEST
    x = jnp.einsum("bhwc,oh->bowc", x, jnp.asarray(mh), precision=hp_prec)
    return jnp.einsum("bhwc,ow->bhoc", x, jnp.asarray(mw), precision=hp_prec)


def get_grid(dm: jnp.ndarray, sample_hw: tuple[int, int], kernel_size: int = 65,
             eps: float = 1e-6) -> jnp.ndarray:
    """dm: padded deformation map [B, HS+2p, WS+2p, 1] (p = kernel_size//2).
    Returns grid [B, HS, WS, 2] with channels (row, col) in [-1, 1]
    (nn_B0:29-78 semantics)."""
    hs, ws = sample_hw
    pad = kernel_size // 2
    assert dm.shape[1] == hs + 2 * pad and dm.shape[2] == ws + 2 * pad
    g = gaussian_kernel_1d(kernel_size, sigma=kernel_size // 2)
    k2 = float(kernel_size * kernel_size)

    rows = (jnp.arange(hs + 2 * pad, dtype=jnp.float32) - pad)[None, :, None, None]
    cols = (jnp.arange(ws + 2 * pad, dtype=jnp.float32) - pad)[None, None, :, None]

    denom = _sep_conv_valid(dm, g) + eps * k2
    num_r = _sep_conv_valid(dm * rows, g) + eps * k2 * jnp.arange(hs, dtype=jnp.float32)[None, :, None, None]
    num_c = _sep_conv_valid(dm * cols, g) + eps * k2 * jnp.arange(ws, dtype=jnp.float32)[None, None, :, None]

    er = num_r / denom / (hs - 1.0) * 2.0 - 1.0
    ec = num_c / denom / (ws - 1.0) * 2.0 - 1.0
    return jnp.concatenate([er, ec], axis=-1)


def int_round_scale_grid(grid: jnp.ndarray, canvas_hw: tuple[int, int]) -> jnp.ndarray:
    """[-1, 1] grid -> clipped integer canvas coordinates (nn_B0:81-99;
    torch ``.to(int64)`` truncates toward zero — coords are >= 0 so floor)."""
    h, w = canvas_hw
    r = jnp.clip(0.5 * (grid[..., 0] + 1.0) * (h - 1), 0, h - 1)
    c = jnp.clip(0.5 * (grid[..., 1] + 1.0) * (w - 1), 0, w - 1)
    return jnp.stack([r, c], axis=-1).astype(jnp.int32)


def deformed_unsampler(labels: jnp.ndarray, int_grid: jnp.ndarray,
                       canvas_hw: tuple[int, int]) -> jnp.ndarray:
    """Scatter sampled labels [B, HS, WS, K] to canvas positions
    ``int_grid`` [B, HS, WS, 2] (row, col) and nearest-fill the holes
    (nn_B0:115-153) — fully on device via JFA (no scipy round-trip)."""
    b, hs, ws, k = labels.shape
    h, w = canvas_hw
    flat_tgt = (int_grid[..., 0] * w + int_grid[..., 1]).reshape(b, hs * ws)
    bidx = jnp.arange(b)[:, None]
    # deterministic collision resolution: the reference's tensor index
    # assignment is last-write-wins in flat source order, which a plain
    # ``.at[].set`` does NOT guarantee on TPU (unspecified duplicate winner).
    # Scatter-max the SOURCE index instead, then gather the winner's label —
    # bit-identical to the reference's semantics, run to run.
    src = jnp.broadcast_to(jnp.arange(hs * ws, dtype=jnp.int32)[None, :], (b, hs * ws))
    win = jnp.full((b, h * w), -1, jnp.int32).at[bidx, flat_tgt].max(src)
    hit = win >= 0
    canvas = labels.reshape(b, hs * ws, k)[bidx, jnp.maximum(win, 0)]
    canvas = jnp.where(hit[..., None], canvas, jnp.zeros_like(canvas))
    canvas = canvas.reshape(b, h, w, k)
    return fill_values_nearest(canvas, hit.reshape(b, h, w))
