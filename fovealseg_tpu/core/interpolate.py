"""Torch-semantics image resizing as separable gathers (NHWC).

The reference leans on ``F.interpolate`` / ``nn.Upsample`` with
``align_corners=False`` everywhere (``b_imresize`` at
/root/reference/dataset.py:30, upsampling inside the deform module at
/root/reference/models/models.py:716,615-621). For checkpoint-parity the
rebuild must reproduce those semantics exactly:

* ``bilinear`` — half-pixel source coords ``(i+0.5)*scale-0.5`` clamped to the
  valid range, pointwise 2-tap interpolation per axis, NO antialiasing
  (``jax.image.resize`` antialiases on downsample, so it is not usable here).
* ``nearest`` — source index ``floor(i * in/out)``.
* ``area`` — adaptive average pooling (torch's ``mode='area'``).

Bilinear resize is separable, so each axis is a dense ``[out, in]`` matrix
multiply; on TPU this maps onto the MXU instead of scattered gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _linear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] matrix for 1-D torch-bilinear resize."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@functools.lru_cache(maxsize=128)
def _area_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] matrix for 1-D adaptive average pooling."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


@functools.lru_cache(maxsize=128)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def _apply_axis_matrix(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    """Contract ``x`` with a [out, in] resize matrix along ``axis``."""
    m = jnp.asarray(mat, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    # full-precision contraction: resize weights must not round to bf16 on TPU
    y = jnp.einsum("...i,oi->...o", x, m, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch ``F.interpolate(mode='bilinear', align_corners=False)``. NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = _apply_axis_matrix(x, _linear_resize_matrix(h, oh), axis=-3)
    if w != ow:
        x = _apply_axis_matrix(x, _linear_resize_matrix(w, ow), axis=-2)
    return x


def resize_area(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch ``F.interpolate(mode='area')`` (adaptive avg pool). NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = _apply_axis_matrix(x, _area_resize_matrix(h, oh), axis=-3)
    if w != ow:
        x = _apply_axis_matrix(x, _area_resize_matrix(w, ow), axis=-2)
    return x


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch ``F.interpolate(mode='nearest')``. NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if h != oh:
        x = jnp.take(x, jnp.asarray(_nearest_index(h, oh)), axis=-3)
    if w != ow:
        x = jnp.take(x, jnp.asarray(_nearest_index(w, ow)), axis=-2)
    return x


def resize_1d(v: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Torch-bilinear resize of a 1-D vector (used for the Gaussian kernel
    aspect-ratio stretch, mirroring b_imresize of the 2-D kernel at
    /root/reference/models/models.py:511)."""
    m = jnp.asarray(_linear_resize_matrix(v.shape[-1], out_size), dtype=v.dtype)
    return jnp.einsum("oi,i->o", m, v, precision=jax.lax.Precision.HIGHEST)
