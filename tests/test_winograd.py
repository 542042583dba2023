"""Winograd F(2x2,3x3) conv: exactness vs lax.conv_general_dilated.

The winograd path is a MEASURED NEGATIVE on this chip (see PERF.md /
benchmarks/winograd_probe.py: 9x slower in-context — transform bandwidth
swamps the 2.25x MAC saving, and the batched matmul is still N=64
lane-limited), so it is not wired into TorchConv; the implementation and
this exactness pin keep the experiment reproducible on TPU generations
where the tradeoff may flip.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from fovealseg_tpu.models.winograd import winograd_conv3x3, winograd_weights


def _direct(x, ker):
    dn = lax.conv_dimension_numbers(x.shape, ker.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, ker, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )


@pytest.mark.parametrize(
    "b,h,w,c,k",
    [(2, 8, 8, 5, 7), (1, 80, 80, 64, 64), (3, 16, 10, 64, 32)],
)
def test_winograd_matches_direct_conv(b, h, w, c, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, c, k)) * 0.1, jnp.float32)
    ref = _direct(x, ker)
    got = winograd_conv3x3(x, ker)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel


def test_winograd_prehoisted_weights_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 16)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 16, 24)) * 0.1, jnp.float32)
    u = winograd_weights(ker)
    assert u.shape == (16, 16, 24)
    np.testing.assert_allclose(
        np.asarray(winograd_conv3x3(x, ker, u=u)),
        np.asarray(winograd_conv3x3(x, ker)),
        rtol=0, atol=1e-6,
    )


def test_winograd_differentiable():
    import jax

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)

    g_w = jax.grad(lambda k: jnp.sum(winograd_conv3x3(x, k) ** 2))(ker)
    g_d = jax.grad(lambda k: jnp.sum(_direct(x, k) ** 2))(ker)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_d), rtol=1e-3, atol=1e-4)
