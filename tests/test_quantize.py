"""W8A8 int8 serving quantization (models/layers.py::_int8_conv).

Dynamic symmetric quantization: per-output-channel weight scales, per-tensor
activation scale, int32 MXU accumulation. Applied only to convs with >=128
in AND out channels (the v5e MXU runs int8 ~2x bf16 there; 64-channel convs
are lane-limited either way — measured table in models/layers.py). These
tests pin the numeric error envelope, the gating rules, and end-to-end
argmax agreement of the quantized flagship against the bf16 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.models import layers


@pytest.fixture(autouse=True)
def _quant_off_after():
    yield
    layers.set_quantization(False)


def _conv_apply(x, features, k=3, stride=1, padding=1, seed=0):
    mod = layers.conv2d(features, k, stride, padding, use_bias=True)
    variables = mod.init(jax.random.PRNGKey(seed), x)
    return mod.apply(variables, x), variables, mod


def test_int8_conv_error_envelope():
    """Quantized conv matches f32 within the expected int8 resolution:
    relative error of the output bounded by ~ (1/127) * sqrt-accumulated
    rounding — in practice <2% RMS for well-conditioned inputs."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
    ref, variables, mod = _conv_apply(x, 128)
    with layers.quantization():
        out = mod.apply(variables, x)
    ref, out = np.asarray(ref), np.asarray(out)
    rms = np.sqrt(np.mean((out - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rms < 0.02, rms
    # zero input stays exactly zero (symmetric quant, zero-point 0)
    with layers.quantization():
        z = mod.apply(variables, jnp.zeros_like(x))
    b = np.asarray(variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(b, z.shape), atol=1e-7)


def test_int8_gating_rules():
    """Only >=128-channel convs quantize; 64-channel convs and the flag-off
    default produce the unquantized result bit-for-bit."""
    rng = np.random.default_rng(1)
    x64 = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    ref64, v64, m64 = _conv_apply(x64, 64)
    with layers.quantization():
        out64 = m64.apply(v64, x64)
    np.testing.assert_array_equal(np.asarray(out64), np.asarray(ref64))

    x128 = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    ref128, v128, m128 = _conv_apply(x128, 128)
    with layers.quantization():
        out128 = m128.apply(v128, x128)
    assert not np.array_equal(np.asarray(out128), np.asarray(ref128))
    # flag restored by the context manager
    again = m128.apply(v128, x128)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(ref128))
    # mixed channel counts: 128-in/64-out stays unquantized
    refm, vm, mm = _conv_apply(x128, 64)
    with layers.quantization():
        outm = mm.apply(vm, x128)
    np.testing.assert_array_equal(np.asarray(outm), np.asarray(refm))


def test_int8_flagship_argmax_agreement():
    """End-to-end: the quantized flagship inference path agrees with bf16 on
    almost all warped-domain argmax labels (small model config, real params
    from init — the agreement bound is the serving-quality contract)."""
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

    cfg = DeformConfig(
        task_hw=(16, 16),
        task_hw_infer=(16, 16),
        saliency_hw=(16, 16),
        gaussian_radius=9,
        num_class=8,
        arch_encoder="hrnetv2_nodownsp",
    )
    module = DeformSegmentation(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    f = jnp.full((2, 2), 0.5, jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, f)

    pred = module.apply(variables, x, f, train=False)["pred"]
    with layers.quantization():
        pred_q = jax.jit(
            lambda x, f: module.apply(variables, x, f, train=False)["pred"]
        )(x, f)
    lab = np.asarray(jnp.argmax(pred, axis=-1))
    lab_q = np.asarray(jnp.argmax(pred_q, axis=-1))
    agree = float(np.mean(lab == lab_q))
    assert agree > 0.95, agree


def test_prequantized_weights_match_in_graph():
    """quantize_params hoists the weight max/round out of the step; the
    pre-quantized path must be bit-identical to in-graph quantization."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    _, variables, mod = _conv_apply(x, 128)
    with layers.quantization():
        in_graph = mod.apply(variables, x)
        qvars = dict(variables)
        qvars["quant"] = layers.quantize_params(variables["params"])
        assert "kernel_q" in qvars["quant"] and "w_scale" in qvars["quant"]
        pre = mod.apply(qvars, x)
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(in_graph))
    # non-quantizable kernels are excluded from the collection
    x64 = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    _, v64, _ = _conv_apply(x64, 64)
    assert layers.quantize_params(v64["params"]) == {}


def test_quantized_kernel_paths_exclude_plain_nn_conv():
    """quantized_kernel_paths covers exactly the TorchConv scopes; a plain
    nn.Conv kernel of quantizable shape (e.g. deeplab's dilated trunk) is
    excluded from quantize_params when the paths filter is applied —
    otherwise its quant entries would be dead device memory."""
    import flax.linen as nn

    class Mixed(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = layers.conv2d(128, 1, 1, 0, name="tconv")(x)
            return nn.Conv(128, (3, 3), padding="SAME", name="pconv")(x)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    mod = Mixed()
    variables = mod.init(jax.random.PRNGKey(0), x)
    paths = layers.quantized_kernel_paths(mod, variables, x)
    assert paths == {("tconv",)}
    quant = layers.quantize_params(variables["params"], paths)
    assert "tconv" in quant and "pconv" not in quant
    # unfiltered, the shape heuristic alone would have included pconv
    assert "pconv" in layers.quantize_params(variables["params"])
    # the filtered collection drives the same bit-exact int8 path
    with layers.quantization():
        in_graph = mod.apply(variables, x)
        pre = mod.apply({**variables, "quant": quant}, x)
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(in_graph))


def test_quantize_config_key():
    from fovealseg_tpu.configs import get_default_cfg

    cfg = get_default_cfg()
    assert cfg.TPU.quantize == ""
