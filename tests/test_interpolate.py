"""Parity of resize ops vs torch.nn.functional.interpolate (CPU oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from fovealseg_tpu.core.interpolate import (
    resize_area,
    resize_bilinear,
    resize_nearest,
    resize_1d,
)


def _torch_resize(x_nhwc: np.ndarray, out_hw, mode):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    y = TF.interpolate(t, size=out_hw, mode=mode)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("in_hw,out_hw", [((640, 640), (80, 80)), ((37, 53), (80, 80)),
                                          ((80, 80), (640, 640)), ((64, 128), (80, 80))])
def test_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    ref = _torch_resize(x, out_hw, "bilinear")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=3e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((640, 640), (80, 80)), ((100, 60), (33, 17))])
def test_area_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 1)).astype(np.float32)
    ours = np.asarray(resize_area(jnp.asarray(x), out_hw))
    ref = _torch_resize(x, out_hw, "area")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((640, 640), (80, 80)), ((80, 80), (640, 640)),
                                          ((33, 47), (80, 80))])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = _torch_resize(x, out_hw, "nearest")
    np.testing.assert_array_equal(ours, ref)


def test_resize_1d_matches_torch(rng):
    v = rng.standard_normal(91).astype(np.float32)
    ours = np.asarray(resize_1d(jnp.asarray(v), 181))
    ref = TF.interpolate(torch.from_numpy(v)[None, None, None, :], size=(1, 181),
                         mode="bilinear").numpy()[0, 0, 0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=3e-5)


def test_integer_factor_closed_forms_match_matrix(rng):
    """The slice/repeat integer-scale resize forms (kept for reference) are
    float-exact against the dense-matrix path used by the dispatchers."""
    from fovealseg_tpu.core.interpolate import (
        _apply_axis_matrix,
        _downsample_int_axis,
        _linear_resize_matrix,
        _upsample_int_axis,
    )

    for in_s, out_s in [(640, 80), (81, 27), (30, 10)]:
        x = jnp.asarray(rng.standard_normal((2, in_s, 7, 3)).astype(np.float32))
        fast = _downsample_int_axis(x, in_s // out_s, 1)
        ref = _apply_axis_matrix(x, _linear_resize_matrix(in_s, out_s), 1)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-6, atol=1e-6)
    for in_s, out_s in [(40, 80), (10, 80), (27, 81)]:
        x = jnp.asarray(rng.standard_normal((2, in_s, 7, 3)).astype(np.float32))
        fast = _upsample_int_axis(x, out_s // in_s, 1)
        ref = _apply_axis_matrix(x, _linear_resize_matrix(in_s, out_s), 1)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-6, atol=1e-6)
