"""Edge-map targets for the deformation loss (PIL-free, jittable).

The reference's non-default edge-target modes build per-sample targets with
PIL on the CPU (models/models.py:773-813): normalize the label, bilinear
downsample, ``ImageFilter.GaussianBlur(radius=MODEL.gt_grad_gaussian_blur_r)``,
``ImageFilter.FIND_EDGES``, upsample to the saliency grid (used by
``MODEL.gt_gradient`` motivational-study samplers and by
``TRAIN.opt_deform_LabelEdge`` with ``opt_deform_LabelEdge_norm=False``).

PIL's FIND_EDGES is a fixed 3x3 Laplacian ([[-1,-1,-1],[-1,8,-1],[-1,-1,-1]],
scale 1) on uint8 with clamping — reproduced exactly here; the Gaussian blur
uses a true Gaussian kernel with sigma = radius (documented deviation: PIL
approximates with iterated box blurs; quality-equivalent per SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.interpolate import resize_bilinear


def gaussian_blur(img: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Separable Gaussian blur (sigma = radius, span 3*sigma), NHWC 1-channel."""
    if radius <= 0:
        return img
    half = max(1, int(np.ceil(3 * radius)))
    x = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-(x**2) / (2.0 * radius**2))
    g = (g / g.sum()).astype(np.float32)
    kh = jnp.asarray(g).reshape(-1, 1, 1, 1)
    kw = jnp.asarray(g).reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    # edge-extend padding (PIL semantics), then VALID convs
    img = jnp.pad(img, ((0, 0), (half, half), (half, half), (0, 0)), mode="edge")
    img = jax.lax.conv_general_dilated(img, kh, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
    img = jax.lax.conv_general_dilated(img, kw, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
    return img


def pil_find_edges(img01: jnp.ndarray) -> jnp.ndarray:
    """Exact PIL ImageFilter.FIND_EDGES on a [B, H, W, 1] image in [0, 1]:
    quantize to uint8, 3x3 Laplacian on the interior, clamp to [0, 255];
    border pixels keep the ORIGINAL input (PIL's 3x3 filters do not compute
    the 1-px border — they paste the source there). Interior is bit-exact
    vs PIL (tests/test_edges.py)."""
    u8 = jnp.round(jnp.clip(img01, 0.0, 1.0) * 255.0)
    k = jnp.asarray(
        [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]], jnp.float32
    ).reshape(3, 3, 1, 1)
    out = jax.lax.conv_general_dilated(
        u8, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    out = jnp.clip(jnp.round(out), 0.0, 255.0)
    h, w = img01.shape[1], img01.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    border = (rows == 0) | (rows == h - 1) | (cols == 0) | (cols == w - 1)
    return jnp.where(border, u8, out) / 255.0


def edge_target_pil_style(
    y: jnp.ndarray,
    saliency_hw: tuple[int, int],
    grid_hw: tuple[int, int],
    blur_radius: float = 1.0,
    softmax: bool = False,
    zero_bound: int = 0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Full PIL-style target chain (models/models.py:777-800), vectorized:
    per-sample min-max normalize -> bilinear downsample to the saliency size
    -> Gaussian blur -> FIND_EDGES -> upsample to the grid -> optional
    softmax (opt_deform_LabelEdge_softmax) and zero-bound border mask
    (TRAIN.deform_zero_bound). y: [B, H, W] labels/masks."""
    b = y.shape[0]
    yf = y.astype(jnp.float32)
    lo = jnp.min(yf.reshape(b, -1), axis=1)[:, None, None]
    hi = jnp.max(yf.reshape(b, -1), axis=1)[:, None, None]
    norm = (yf - lo) / jnp.maximum(hi - lo, eps)
    low = resize_bilinear(norm[..., None], saliency_hw)
    low = gaussian_blur(low, blur_radius)
    edges = pil_find_edges(low)
    xs_t = resize_bilinear(edges, grid_hw)
    if softmax:
        flat = xs_t.reshape(b, -1)
        xs_t = jax.nn.softmax(flat, axis=-1).reshape(xs_t.shape)
    if zero_bound > 0:
        mask = jnp.zeros_like(xs_t)
        mask = mask.at[:, zero_bound:-zero_bound, zero_bound:-zero_bound, :].set(1.0)
        xs_t = xs_t * mask
    return xs_t
