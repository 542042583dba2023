"""Output-pixel-packed convolution (models/layers.py::_packed_conv).

The packed formulation rewrites 64-channel same-size 3x3 convs as
(3, 6)-kernel stride-(1, 4) convs with 4 output pixels in channels — exact
in f32 (the extra kernel positions multiply zeros), a reassociation-level
change in bf16. These tests pin exactness, the gating rules, and that full
models produce identical results with packing on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.models import layers


@pytest.fixture(autouse=True)
def _packing_off_after():
    yield
    layers.set_conv_packing(False)


def _conv_apply(x, features, k=3, stride=1, padding=1, seed=0):
    mod = layers.conv2d(features, k, stride, padding, use_bias=True)
    variables = mod.init(jax.random.PRNGKey(seed), x)
    return mod.apply(variables, x), variables, mod


def test_packed_conv_equivalent_f32():
    """f32 packed == standard up to conv-reduction reassociation (measured
    bit-exact on the TPU conv lowering; the CPU backend reassociates)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    ref, variables, mod = _conv_apply(x, 64)
    with layers.conv_packing():
        out = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-6)


def test_packed_conv_bf16_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    mod = layers.conv2d(64, 3, 1, 1, use_bias=False, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x).astype(jnp.float32)
    with layers.conv_packing():
        out = mod.apply(variables, x).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.25, rtol=0.05)


@pytest.mark.parametrize(
    "shape,features,k,stride,padding,expect",
    [
        ((1, 16, 16, 64), 64, 3, 1, 1, 4),   # the flagship case
        ((1, 16, 16, 3), 64, 3, 1, 1, 4),    # stem conv
        ((1, 16, 16, 64), 128, 3, 1, 1, 1),  # too many outputs
        ((1, 16, 16, 64), 64, 3, 2, 1, 1),   # strided
        ((1, 16, 16, 64), 64, 1, 1, 0, 1),   # 1x1 (measured slower)
        ((1, 16, 15, 64), 64, 3, 1, 1, 1),   # width not divisible by 4
        ((1, 16, 16, 64), 64, 3, 1, 0, 1),   # not a same-size conv
    ],
)
def test_pack_gate(shape, features, k, stride, padding, expect):
    layers.set_conv_packing(True)
    assert layers._pack_factor(shape, k, stride, padding, features) == expect
    layers.set_conv_packing(False)
    assert layers._pack_factor(shape, k, stride, padding, features) == 1


def test_packed_gradients_match_f32():
    """Autodiff through the in-graph weight scatter equals the standard path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    mod = layers.conv2d(64, 3, 1, 1, use_bias=True)
    variables = mod.init(jax.random.PRNGKey(3), x)

    def loss(v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_ref = jax.grad(loss)(variables, x)
    with layers.conv_packing():
        g_pack = jax.grad(loss)(variables, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-5)


def test_hrnet_forward_identical_f32():
    from fovealseg_tpu.models.hrnet import HRNetV2NoDownsp

    enc = HRNetV2NoDownsp(stage_modules=(1, 1, 1), num_blocks=1, layer1_blocks=1)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 16, 16, 3)), jnp.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    ref = enc.apply(variables, x)[0]
    with layers.conv_packing():
        out = enc.apply(variables, x)[0]
    # reassociation drift accumulates through the deep stack
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-3)


def test_flagship_infer_identical_f32():
    """End-to-end DeformSegmentation.infer with packing on == off (f32)."""
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

    cfg = DeformConfig(
        task_hw=(16, 16), task_hw_infer=(16, 16), saliency_hw=(16, 16),
        gaussian_radius=5, num_class=5, arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    x = jnp.asarray(np.random.default_rng(5).random((1, 64, 64, 3)), jnp.float32)
    f = jnp.asarray([[0.4, 0.6]], jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(1)}, x, f)
    ref = module.apply(variables, x, f, method=module.infer)
    with layers.conv_packing():
        out = module.apply(variables, x, f, method=module.infer)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-4, rtol=5e-3
        )
