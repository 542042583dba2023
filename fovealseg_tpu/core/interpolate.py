"""Torch-semantics image resizing (NHWC), TPU-fast.

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

The compiled path expresses each axis as a dense ``[out, in]`` matrix
contraction (separable), which XLA tiles onto the MXU; closed-form
integer-factor slice/repeat variants exist below (exactness-tested) but were
A/B-measured slower than the MXU route on the target chip, so they are not
wired into the dispatchers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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


def _downsample_int_axis(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Torch-bilinear downsample by integer factor ``s`` along ``axis``.

    src = (i+0.5)*s - 0.5 has constant fractional part: 0 for odd s (pure
    strided slice), 0.5 for even s (mean of the two center samples).
    """
    n = x.shape[axis]
    if s % 2 == 1:
        off = (s - 1) // 2
        return lax.slice_in_dim(x, off, n, stride=s, axis=axis)
    off = s // 2
    a = lax.slice_in_dim(x, off - 1, n - 1, stride=s, axis=axis)
    b = lax.slice_in_dim(x, off, n, stride=s, axis=axis)
    half = jnp.asarray(0.5, x.dtype)
    return (a + b) * half


@functools.lru_cache(maxsize=64)
def _upsample_weight_pattern(s: int) -> np.ndarray:
    """w[r] = frac of src coord, period-s; src = (r+0.5)/s - 0.5."""
    r = np.arange(s, dtype=np.float64)
    src = (r + 0.5) / s - 0.5
    return (src - np.floor(src)).astype(np.float32)


def _upsample_int_axis(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """Torch-bilinear upsample by integer factor ``s`` along ``axis``.

    out[i] = (1-w)*in[lo] + w*in[lo+1] with lo = floor((i+0.5)/s - 0.5).
    Both taps are shifted views of ``repeat(x, s)`` (shift s//2 left / s-s//2
    right); the repeat blocks at either end provide the edge clamping exactly
    (lo = -1 and lo+1 = n collapse to in[0] / in[n-1] with total weight 1).
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    ns = n * s
    p = jnp.repeat(x, s, axis=axis)
    k = s // 2
    if k > 0:
        head = lax.slice_in_dim(p, 0, k, axis=axis)  # k copies of in[0]
        lo_tap = jnp.concatenate([head, lax.slice_in_dim(p, 0, ns - k, axis=axis)], axis=axis)
    else:
        lo_tap = p
    t = s - k
    tail = lax.slice_in_dim(p, ns - t, ns, axis=axis)  # t copies of in[n-1]
    hi_tap = jnp.concatenate([lax.slice_in_dim(p, t, ns, axis=axis), tail], axis=axis)
    w = np.tile(_upsample_weight_pattern(s), n)
    shape = [1] * x.ndim
    shape[axis] = ns
    w = jnp.asarray(w, x.dtype).reshape(shape)
    one = jnp.asarray(1.0, x.dtype)
    return (one - w) * lo_tap + w * hi_tap


def _resize_linear_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    # NOTE: the integer-factor slice/repeat forms above were A/B-measured on
    # the target chip (benchmarks history, round 2) and LOSE to the dense
    # matrix contraction — XLA's MXU path beats VPU slicing for every hot
    # shape (640->80 decimation, 2x/4x/8x fuse upsamples). They are kept
    # (tested for exactness) for CPU/interpret use and documentation, but the
    # compiled path always takes the matrix route.
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    return _apply_axis_matrix(x, _linear_resize_matrix(in_size, out_size), axis=axis)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch ``F.interpolate(mode='bilinear', align_corners=False)``. NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    x = _resize_linear_axis(x, oh, axis=x.ndim - 3)
    x = _resize_linear_axis(x, ow, axis=x.ndim - 2)
    return x


def _resize_area_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    # dense-matrix route only; see note in _resize_linear_axis
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    return _apply_axis_matrix(x, _area_resize_matrix(in_size, out_size), axis=axis)


def resize_area(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch ``F.interpolate(mode='area')`` (adaptive avg pool). NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    x = _resize_area_axis(x, oh, axis=x.ndim - 3)
    x = _resize_area_axis(x, ow, axis=x.ndim - 2)
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
