"""Foveated (non-uniform) resampling: torch-``grid_sample`` semantics in JAX.

The reference warps images/labels/predictions through deformation grids with
``F.grid_sample`` (forward warp at /root/reference/models/models.py:909,880;
inverse warp at models/models_instance.py:886). Semantics reproduced here:

* grid is [B, Ho, Wo, 2] with last dim (x, y): x indexes width, y height.
* ``align_corners=False`` unnormalization: ``ix = ((x+1)*W - 1)/2``.
* ``padding_mode='zeros'``: out-of-bounds taps contribute 0.
* modes: ``bilinear`` (4-tap) and ``nearest``.

Layout is NHWC (TPU-native). TPU gathers are latency-bound at ~10 ns per
gathered row regardless of row width (measured on-chip), so the bilinear
sampler packs the whole 2x2 neighborhood into the channel axis of a
(+1,+1)-shifted zero-padded copy of the image and issues ONE gather instead
of four (``_grid_sample_packed``); the shift makes the x0 = y0 = -1 corner
cases land in range so clipping never aliases a tap. A 4-separate-tap
reference implementation is kept for tests (``_grid_sample_taps``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=False: [-1, 1] -> [-0.5, size-0.5] pixel-center space
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_flat(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img [B,H,W,C], iy/ix [B,Ho,Wo] int32 (already clipped) -> [B,Ho,Wo,C]."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = (iy * w + ix).reshape(b, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(b, iy.shape[1], iy.shape[2], c)


def _bilinear_coords(grid: jnp.ndarray, h: int, w: int):
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = _unnormalize(gx, w)
    iy = _unnormalize(gy, h)
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    wx1 = ix - x0.astype(ix.dtype)
    wy1 = iy - y0.astype(iy.dtype)
    return x0, y0, wx1, wy1


def _grid_sample_taps(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Reference bilinear path: four independent masked gathers."""
    _, h, w, _ = img.shape
    x0, y0, wx1, wy1 = _bilinear_coords(grid, h, w)
    wx1 = wx1.astype(img.dtype)
    wy1 = wy1.astype(img.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(yc, xc, wgt):
        valid = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        v = _gather_flat(img, jnp.clip(yc, 0, h - 1), jnp.clip(xc, 0, w - 1))
        return v * (wgt * valid.astype(img.dtype))[..., None]

    return (
        tap(y0, x0, wy0 * wx0)
        + tap(y0, x0 + 1, wy0 * wx1)
        + tap(y0 + 1, x0, wy1 * wx0)
        + tap(y0 + 1, x0 + 1, wy1 * wx1)
    )


def _grid_sample_packed(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with ONE gather: the 2x2 neighborhood of every pixel of
    a zero-padded, (+1,+1)-shifted image copy is packed into channels.

    ``nb[y, x] = [p[y,x], p[y,x+1], p[y+1,x], p[y+1,x+1]]`` where
    ``p = pad(img, 1)``; gathering ``nb`` at (y0+1, x0+1) yields all four taps
    for x0, y0 in [-1, size-1] — the full reachable range of a clamped grid —
    without clip aliasing. Out-of-canvas taps read the zero padding, matching
    ``padding_mode='zeros'``; taps from pathological coords beyond the padded
    range are clipped and then zero-weighted.
    """
    b, h, w, c = img.shape
    x0, y0, wx1, wy1 = _bilinear_coords(grid, h, w)
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nb = jnp.concatenate(
        [
            p[:, : h + 1, : w + 1],
            p[:, : h + 1, 1:],
            p[:, 1:, : w + 1],
            p[:, 1:, 1:],
        ],
        axis=-1,
    )  # [B, h+1, w+1, 4c]
    xc = jnp.clip(x0 + 1, 0, w)
    yc = jnp.clip(y0 + 1, 0, h)
    g = _gather_flat(nb, yc, xc)  # [B, Ho, Wo, 4c]

    # one mask: the gather is tap-aligned iff x0 in [-1, w-1] and y0 in
    # [-1, h-1]; inside that range the zero padding reproduces
    # padding_mode='zeros' at the +/-1 borders exactly, and outside it every
    # tap lies off-canvas so the whole contribution is zero.
    aligned = ((x0 >= -1) & (x0 < w) & (y0 >= -1) & (y0 < h)).astype(img.dtype)
    wx1 = wx1.astype(img.dtype)
    wy1 = wy1.astype(img.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    w00 = (wy0 * wx0) * aligned
    w01 = (wy0 * wx1) * aligned
    w10 = (wy1 * wx0) * aligned
    w11 = (wy1 * wx1) * aligned
    return (
        g[..., 0 * c : 1 * c] * w00[..., None]
        + g[..., 1 * c : 2 * c] * w01[..., None]
        + g[..., 2 * c : 3 * c] * w10[..., None]
        + g[..., 3 * c : 4 * c] * w11[..., None]
    )


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Sample ``img`` [B,H,W,C] at ``grid`` [B,Ho,Wo,2] ((x,y) in [-1,1]).

    Matches ``torch.nn.functional.grid_sample(..., mode=mode,
    padding_mode='zeros', align_corners=False)`` up to float tolerance.
    """
    _, h, w, _ = img.shape
    if mode == "nearest":
        gx = grid[..., 0].astype(jnp.float32)
        gy = grid[..., 1].astype(jnp.float32)
        ix = _unnormalize(gx, w)
        iy = _unnormalize(gy, h)
        # CUDA torch rounds half away from zero (::round); the clamped grid
        # reaches ix = -0.5 exactly (grid coord -1.0), where half-away gives
        # -1 -> out of bounds -> zero padding. (CPU torch uses nearbyint /
        # round-half-even there — the reference's published runs are CUDA, so
        # we pin the CUDA convention; tests avoid the tie everywhere else.)
        x0 = jnp.where(ix >= 0, jnp.floor(ix + 0.5), jnp.ceil(ix - 0.5)).astype(jnp.int32)
        y0 = jnp.where(iy >= 0, jnp.floor(iy + 0.5), jnp.ceil(iy - 0.5)).astype(jnp.int32)
        valid = (x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h)
        out = _gather_flat(img, jnp.clip(y0, 0, h - 1), jnp.clip(x0, 0, w - 1))
        return out * valid[..., None].astype(img.dtype)

    if mode != "bilinear":
        raise ValueError(f"Unsupported grid_sample mode: {mode}")
    # Measured on-chip: the single packed gather wins for 2-byte dtypes
    # (1.25 ms vs 1.83 ms at b8 640->80); for 4-byte dtypes the packed
    # neighborhood build (4x f32 image) costs more than the 3 saved gathers.
    if img.dtype.itemsize <= 2:
        return _grid_sample_packed(img, grid)
    return _grid_sample_taps(img, grid)
