"""Learn-to-downsample grid solver (Recasens et al. Eq. 3), TPU-first.

Rebuilds ``DeformSegmentationModule.create_grid``
(/root/reference/models/models.py:594-657) plus the constructor's Gaussian
filter and coordinate basis (models/models.py:510-522):

* saliency map ``xs`` is padded (replication by default,
  models/models.py:819-825), then convolved against a fixed Gaussian kernel
  both alone (denominator) and multiplied by the coordinate basis ``P_basis``
  (numerator); the ratio, mapped to [-1, 1] and clamped, is the sampling grid.
* the label grid ``grid_y`` is the same grid resized to the label resolution.
* the inverse grid scatters each task pixel's normalized task coordinates into
  the full-resolution canvas at the integer location the forward grid samples
  from, NaN elsewhere (models/models.py:640-655).

TPU-native design choices (not in the reference):

* The 2-D Gaussian kernel is an outer product (``makeGaussian``
  models/models.py:140-157 then a bilinear aspect stretch at 510-511), so the
  (2r+1)^2 dense conv is computed as two 1-D convs — ~45x fewer FLOPs at
  r=45 — expressed as dense matmuls that XLA tiles onto the MXU.
* Numerator and denominator share one batched conv over 3 stacked channels.
* The inverse scatter resolves duplicate hits with a max-reduction over the
  flattened task index, which reproduces the reference's last-write-wins
  semantics deterministically.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.interpolate import resize_bilinear, _linear_resize_matrix


def make_gaussian_1d(size: int, fwhm: float, center: float | None = None) -> np.ndarray:
    """1-D factor of ``makeGaussian`` (models/models.py:140-157): the 2-D
    kernel is ``exp(-4 ln2 ((x-x0)^2+(y-y0)^2)/fwhm^2)`` = outer(g, g)."""
    x = np.arange(0, size, 1, dtype=np.float64)
    x0 = size // 2 if center is None else center
    return np.exp(-4.0 * np.log(2.0) * (x - x0) ** 2 / fwhm**2).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _gaussian_factors(pad_x: int, pad_y: int, radius: float) -> tuple[np.ndarray, np.ndarray]:
    """Row/col 1-D kernels. The reference builds a (2px+1)^2 kernel then
    bilinear-resizes to (2px+1, 2py+1) (models/models.py:510-511); bilinear
    resize is separable, so the stretched kernel stays an outer product."""
    g = make_gaussian_1d(2 * pad_x + 1, fwhm=radius)
    if pad_y == pad_x:
        gy = g
    else:
        m = _linear_resize_matrix(2 * pad_x + 1, 2 * pad_y + 1)
        gy = (m @ g).astype(np.float32)
    return g, gy


def pad_saliency(xs: jnp.ndarray, pad_x: int, pad_y: int, mode: str = "replication"):
    """Pad [B,H,W,1] saliency by (pad_x rows, pad_y cols); modes mirror
    TRAIN.def_saliency_pad_mode (models/models.py:819-825)."""
    widths = ((0, 0), (pad_x, pad_x), (pad_y, pad_y), (0, 0))
    if mode == "replication":
        return jnp.pad(xs, widths, mode="edge")
    if mode == "reflect":
        return jnp.pad(xs, widths, mode="reflect")
    if mode == "zero":
        return jnp.pad(xs, widths, mode="constant")
    raise ValueError(f"Unknown def_saliency_pad_mode: {mode}")


@dataclasses.dataclass(frozen=True)
class GridSolver:
    """Static geometry for one (saliency size, radius, aspect) configuration.

    Mirrors the ctor state of DeformSegmentationModule
    (models/models.py:492-522): grid_size_* from TRAIN.saliency_input_size /
    MODEL.saliency_output_size_short, padding from MODEL.gaussian_radius and
    MODEL.gaussian_ap.
    """

    grid_h: int  # grid_size_x in the reference (rows)
    grid_w: int  # grid_size_y (cols)
    pad_x: int  # rows padding = MODEL.gaussian_radius
    pad_y: int  # cols padding = int(gaussian_ap * pad_x)
    radius: float  # fwhm of the Gaussian

    @classmethod
    def from_cfg(cls, cfg) -> "GridSolver":
        sal_h, sal_w = cfg.TRAIN.saliency_input_size
        if cfg.MODEL.saliency_output_size_short == 0:
            grid_h = sal_h
        else:
            grid_h = cfg.MODEL.saliency_output_size_short
        grid_w = sal_w // (sal_h // grid_h)
        pad_x = cfg.MODEL.gaussian_radius
        ap = cfg.MODEL.gaussian_ap if cfg.MODEL.gaussian_ap != 0.0 else sal_w // sal_h
        pad_y = int(ap * pad_x)
        return cls(grid_h, grid_w, pad_x, pad_y, float(cfg.MODEL.gaussian_radius))

    @property
    def global_h(self) -> int:
        return self.grid_h + 2 * self.pad_x

    @property
    def global_w(self) -> int:
        return self.grid_w + 2 * self.pad_y

    def p_basis(self) -> tuple[np.ndarray, np.ndarray]:
        """(u, v) coordinate basis over the padded canvas, [GH, GW] each.

        u = (col - pad_y)/(grid_w - 1) feeds the x (width) grid channel;
        v = (row - pad_x)/(grid_h - 1) feeds y — models/models.py:517-522.
        """
        i = np.arange(self.global_h, dtype=np.float32)[:, None]
        j = np.arange(self.global_w, dtype=np.float32)[None, :]
        u = np.broadcast_to((j - self.pad_y) / (self.grid_w - 1.0), (self.global_h, self.global_w))
        v = np.broadcast_to((i - self.pad_x) / (self.grid_h - 1.0), (self.global_h, self.global_w))
        return u.astype(np.float32), v.astype(np.float32)

    def _sep_conv_valid(self, x: jnp.ndarray) -> jnp.ndarray:
        """Separable VALID Gaussian conv on [B, GH, GW, C] -> [B, gh, gw, C].

        Each axis is a dense [out, in] banded matrix-multiply (MXU-friendly);
        equivalent to the reference's single (2px+1)x(2py+1) conv
        (models/models.py:514-515, 600-606) because the kernel is separable.
        """
        gx, gy = _gaussian_factors(self.pad_x, self.pad_y, self.radius)
        # rows: [grid_h, global_h] banded matrix of the 1-D kernel
        mh = np.zeros((self.grid_h, self.global_h), dtype=np.float32)
        for r in range(self.grid_h):
            mh[r, r : r + 2 * self.pad_x + 1] = gx
        mw = np.zeros((self.grid_w, self.global_w), dtype=np.float32)
        for r in range(self.grid_w):
            mw[r, r : r + 2 * self.pad_y + 1] = gy
        hp = jax.lax.Precision.HIGHEST
        x = jnp.einsum("bhwc,oh->bowc", x, jnp.asarray(mh, x.dtype), precision=hp)
        x = jnp.einsum("bhwc,ow->bhoc", x, jnp.asarray(mw, x.dtype), precision=hp)
        return x

    def solve(self, xs_hm: jnp.ndarray) -> jnp.ndarray:
        """Padded saliency [B, GH, GW, 1] -> raw grid [B, grid_h, grid_w, 2]
        with last dim (x, y) in [-1, 1] (models/models.py:595-634)."""
        u, v = self.p_basis()
        stacked = jnp.concatenate(
            [xs_hm, xs_hm * jnp.asarray(u)[None, :, :, None], xs_hm * jnp.asarray(v)[None, :, :, None]],
            axis=-1,
        )
        f = self._sep_conv_valid(stacked)
        # tiny eps guards 0/0 when a fixed saliency override (gt_gradient
        # mode) is zero across an entire kernel window; no effect on the
        # softmax-saliency path (denominator >= gaussian-weighted mass > 0)
        denom = f[..., 0:1] + 1e-12
        xg = f[..., 1:2] / denom * 2.0 - 1.0
        yg = f[..., 2:3] / denom * 2.0 - 1.0
        grid = jnp.concatenate([xg, yg], axis=-1)
        return jnp.clip(grid, -1.0, 1.0)

    def upsample_grid(self, grid: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
        """Bilinear-resize a [B, h, w, 2] grid to ``out_hw`` (the reference
        upsamples grids as 2-channel images, models/models.py:615-621)."""
        return resize_bilinear(grid, out_hw)

    def create_grid(
        self,
        xs_hm: jnp.ndarray,
        task_hw: tuple[int, int],
        label_hw: tuple[int, int] | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(grid, grid_y) at task / label resolution — the training-path
        return of create_grid (models/models.py:594-638)."""
        raw = self.solve(xs_hm)
        grid = self.upsample_grid(raw, task_hw)
        # the reference composes raw -> task -> label (grid_y is Upsample of
        # the ALREADY-task-sized grid, models/models.py:628-632), which only
        # matches a direct raw -> label resize for integer scale chains —
        # compose for exactness at fractional ratios
        label_hw = label_hw if label_hw is not None else task_hw
        grid_y = grid if label_hw == tuple(task_hw) else self.upsample_grid(grid, label_hw)
        return grid, grid_y


def landing_scatter_max(grid: jnp.ndarray, seg_hw: tuple[int, int],
                        values: jnp.ndarray) -> jnp.ndarray:
    """Scatter per-task-pixel ``values`` [B, th*tw] int32 to the full-res
    landing positions of the forward grid, max-reducing collisions.

    This is THE landing-position convention of the inverse warp (truncated
    integer coordinates of the unnormalized grid, models/models.py:640-647);
    every consumer (``inverse_grid_index``, the argmax serving scatter) goes
    through here so collision winners stay consistent. Returns
    [B, Hs, Ws] int32 with -1 where nothing landed.
    """
    b, th, tw, _ = grid.shape
    hs, ws = seg_hw
    u = jnp.floor((grid[..., 0] + 1.0) / 2.0 * (ws - 1)).astype(jnp.int32)
    v = jnp.floor((grid[..., 1] + 1.0) / 2.0 * (hs - 1)).astype(jnp.int32)
    target = (v * ws + u).reshape(b, th * tw)
    canvas = jnp.full((b, hs * ws), -1, dtype=jnp.int32)
    canvas = canvas.at[jnp.arange(b)[:, None], target].max(values)
    return canvas.reshape(b, hs, ws)


def inverse_grid_index(grid: jnp.ndarray, seg_hw: tuple[int, int]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-based inverse map as raw flat task indices.

    Returns (task_idx [B, Hs, Ws] int32 with -1 at holes, valid bool mask).
    ``inverse_grid`` derives the reference's NaN-holed coordinate grid from
    this; the fast inverse-warp path consumes the indices directly.
    """
    b, th, tw, _ = grid.shape
    flat_task = jnp.broadcast_to(jnp.arange(th * tw, dtype=jnp.int32)[None], (b, th * tw))
    canvas = landing_scatter_max(grid, seg_hw, flat_task)
    return canvas, canvas >= 0


def inverse_grid(grid: jnp.ndarray, seg_hw: tuple[int, int]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-based inverse deformation grid (models/models.py:640-655).

    For every task pixel (i, j), the forward grid's sample location is
    truncated to integer full-res coordinates (u, v); the normalized task
    coordinates (j, i) are written there. Duplicates resolve last-write-wins
    (emulated deterministically with a max-scatter over the flat task index).

    Returns:
      grid_inv: [B, Hs, Ws, 2] with (x, y) in [-1, 1]; holes hold NaN.
      valid:    [B, Hs, Ws] bool — True where a task pixel landed.
    """
    b, th, tw, _ = grid.shape
    canvas, valid = inverse_grid_index(grid, seg_hw)
    safe = jnp.maximum(canvas, 0)
    j_rec = (safe % tw).astype(jnp.float32)
    i_rec = (safe // tw).astype(jnp.float32)
    gx = j_rec / tw * 2.0 - 1.0
    gy = i_rec / th * 2.0 - 1.0
    nan = jnp.float32(jnp.nan)
    gx = jnp.where(valid, gx, nan)
    gy = jnp.where(valid, gy, nan)
    return jnp.stack([gx, gy], axis=-1), valid
