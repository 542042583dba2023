"""Foveated (non-uniform) resampling: torch-``grid_sample`` semantics in JAX.

The reference warps images/labels/predictions through deformation grids with
``F.grid_sample`` (forward warp at /root/reference/models/models.py:909,880;
inverse warp at models/models_instance.py:886). Semantics reproduced here:

* grid is [B, Ho, Wo, 2] with last dim (x, y): x indexes width, y height.
* ``align_corners=False`` unnormalization: ``ix = ((x+1)*W - 1)/2``.
* ``padding_mode='zeros'``: out-of-bounds taps contribute 0.
* modes: ``bilinear`` (4-tap) and ``nearest``.

Layout is NHWC (TPU-native). The gather is expressed as a flat
``take_along_axis`` over H*W so XLA lowers it to an efficient dynamic-gather
(measured ~7 ns/row on the target chip regardless of row width, so a hand
kernel has no headroom here — the Pallas budget went to the JFA hole fill,
``fovealseg_tpu.ops.pallas_jfa``).
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
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = _unnormalize(gx, w)
    iy = _unnormalize(gy, h)

    if mode == "nearest":
        # torch uses round-half-away-from-zero; coords here are >= -0.5 so
        # floor(x+0.5) is equivalent on the reachable range.
        x0 = jnp.floor(ix + 0.5).astype(jnp.int32)
        y0 = jnp.floor(iy + 0.5).astype(jnp.int32)
        valid = (x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h)
        out = _gather_flat(img, jnp.clip(y0, 0, h - 1), jnp.clip(x0, 0, w - 1))
        return out * valid[..., None].astype(img.dtype)

    if mode != "bilinear":
        raise ValueError(f"Unsupported grid_sample mode: {mode}")

    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = (ix - x0.astype(ix.dtype)).astype(img.dtype)
    wy1 = (iy - y0.astype(iy.dtype)).astype(img.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(yc, xc, wgt):
        valid = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        v = _gather_flat(img, jnp.clip(yc, 0, h - 1), jnp.clip(xc, 0, w - 1))
        return v * (wgt * valid.astype(img.dtype))[..., None]

    return (
        tap(y0, x0, wy0 * wx0)
        + tap(y0, x1, wy0 * wx1)
        + tap(y1, x0, wy1 * wx0)
        + tap(y1, x1, wy1 * wx1)
    )
