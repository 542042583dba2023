"""Model-zoo shape/semantics smoke tests (tiny sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.models.c1 import C1
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.models.hrnet import HRNetV2NoDownsp
from fovealseg_tpu.models.saliency import CompressNet, FovSimModule


def test_fovsim_compress_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    net = FovSimModule()
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 16, 16, 24)
    comp = CompressNet()
    cp = comp.init(jax.random.PRNGKey(0), y)
    z = comp.apply(cp, y)
    assert z.shape == (2, 16, 16, 1)


def test_c1_bg_modulation(rng):
    feats = jnp.asarray(rng.standard_normal((1, 40, 40, 960)).astype(np.float32))
    dec = C1(num_class=51, fc_dim=960)
    params = dec.init(jax.random.PRNGKey(0), [feats])
    out = dec.apply(params, [feats])
    assert out.shape == (1, 40, 40, 51)
    # non-bg channels are spatially constant (pure class logits broadcast);
    # the bg channel is modulated by the mask so it varies spatially
    fg = np.asarray(out[..., :-1]).astype(np.float64)
    assert np.allclose(fg.std(axis=(1, 2)), 0.0, atol=1e-4)


def test_hrnet_output_channels(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    enc = HRNetV2NoDownsp(stage_modules=(1, 1, 1), num_blocks=1, layer1_blocks=1)
    params = enc.init(jax.random.PRNGKey(0), x)
    (y,) = enc.apply(params, x)
    assert y.shape == (1, 16, 16, 960)


@pytest.fixture(scope="module")
def tiny_deform():
    cfg = DeformConfig(
        task_hw=(16, 16),
        task_hw_infer=(16, 16),
        saliency_hw=(16, 16),
        gaussian_radius=5,
        arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    f = jnp.asarray([[0.5, 0.5]], jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x, f)
    return module, params, x, f


def test_deform_forward_shapes(tiny_deform):
    module, params, x, f = tiny_deform
    out = module.apply(params, x, f)
    assert out["xs"].shape == (1, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(out["xs"]).sum(), 1.0, rtol=1e-5)
    assert out["grid"].shape == (1, 16, 16, 2)
    assert out["x_sampled"].shape == (1, 16, 16, 3)
    assert out["pred"].shape == (1, 16, 16, 51)
    # param tree has the 4-network split
    top = set(params["params"].keys())
    assert top == {"localization", "net_compress", "encoder", "decoder"}


def test_deform_infer_shapes(tiny_deform):
    module, params, x, f = tiny_deform
    out = module.apply(params, x, f, method=DeformSegmentation.infer)
    assert out["pred_sampled"].shape == (1, 64, 64, 51)
    assert not np.isnan(np.asarray(out["pred_sampled"])).any()
    assert out["grid_inv"].shape == (1, 64, 64, 2)


def test_deform_infer_eval_size_alignment():
    """TRAIN.task_input_size_eval != task_input_size: the grid itself is
    built at the inference size, so grid, pred, and inverse indices share one
    resolution (ADVICE r1; reference upsamples the grid to
    input_size_net_infer in models/models.py create_grid)."""
    cfg = DeformConfig(
        task_hw=(16, 16),
        task_hw_infer=(32, 32),
        saliency_hw=(16, 16),
        gaussian_radius=5,
        arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f = jnp.asarray([[0.5, 0.5]], jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x, f)
    out = module.apply(params, x, f, method=DeformSegmentation.infer)
    assert out["grid"].shape == (1, 32, 32, 2)
    assert out["x_sampled"].shape == (1, 32, 32, 3)
    assert out["pred"].shape == (1, 32, 32, 51)
    assert out["pred_sampled"].shape == (1, 64, 64, 51)
    assert not np.isnan(np.asarray(out["pred_sampled"])).any()
    # inverse indices address the 32x32 grid, not the 16x16 train grid
    hit = np.asarray(out["grid_inv"])[~np.asarray(out["unfilled_mask"])]
    assert np.isfinite(hit).all()


def test_infer_y_sampled_reverse_is_integer_labels():
    """Label round trips must stay categorical: no bilinear class-id blending
    (reference uses grid_sample mode='nearest', models_instance.py:914)."""
    cfg = DeformConfig(
        task_hw=(16, 16),
        task_hw_infer=(16, 16),
        saliency_hw=(16, 16),
        gaussian_radius=5,
        arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f = jnp.asarray([[0.5, 0.5]], jnp.float32)
    y = np.full((1, 64, 64), 50, np.int32)
    y[0, 20:40, 20:40] = 3  # two classes with a big id gap: any blending
    y[0, 10:12, 50:60] = 17  # would manufacture values outside {3, 17, 50}
    params = module.init(jax.random.PRNGKey(0), x, f)
    out = module.apply(
        params, x, f, y=jnp.asarray(y), y_sampled_reverse=True,
        method=DeformSegmentation.infer,
    )
    got = set(np.unique(np.asarray(out["y_sampled_reverse"])).tolist())
    # the warped label may contain 0 at the clamped-border pixels (torch
    # zero-padding semantics), but the reverse trip must never blend ids —
    # every output value must be an actual warped-label value
    allowed = set(np.unique(np.asarray(out["y_sampled"])).tolist())
    assert got <= allowed, (got, allowed)
    assert got <= {0.0, 3.0, 17.0, 50.0}, got


def test_infer_y_sampled_reverse_tri_one_hot_argmax():
    """For rev_deform_interp='tri' (the defaults.py default) the reference
    one-hot-encodes the warped label, inverse-warps the score planes, fills,
    and argmaxes (models_instance.py:922-933) — the probe output must be
    integer class ids, never blended values."""
    cfg = DeformConfig(
        task_hw=(16, 16),
        task_hw_infer=(16, 16),
        saliency_hw=(16, 16),
        gaussian_radius=5,
        arch_encoder="hrnetv2_nodownsp_tiny",
        rev_deform_interp="tri",
        num_class=51,
    )
    module = DeformSegmentation(config=cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f = jnp.asarray([[0.5, 0.5]], jnp.float32)
    y = np.full((1, 64, 64), 50, np.int32)
    y[0, 16:48, 16:48] = 3
    params = module.init(jax.random.PRNGKey(0), x, f)
    out = module.apply(
        params, x, f, y=jnp.asarray(y), y_sampled_reverse=True,
        method=DeformSegmentation.infer,
    )
    rev = np.asarray(out["y_sampled_reverse"])
    assert rev.shape == (1, 64, 64)
    got = set(np.unique(rev).tolist())
    allowed = set(np.unique(np.asarray(out["y_sampled"])).tolist())
    assert got <= allowed, (got, allowed)
    # the round trip should roughly reconstruct the big center square
    inter = np.sum((rev == 3) & (y == 3))
    union = np.sum((rev == 3) | (y == 3))
    assert inter / union > 0.5, inter / union


def test_segmentation_module_deepsup():
    """Non-deform SegmentationModule with a deep-supervision decoder: tuple
    output + deep_sup_scale loss combination (models/models.py:1097-1144)."""
    import jax

    from fovealseg_tpu.models.deform_module import DeformConfig
    from fovealseg_tpu.models.legacy_decoders import C1DeepSup
    from fovealseg_tpu.models.segmentation_module import SegmentationModule, deep_sup_loss

    cfg = DeformConfig(arch_encoder="hrnetv2_nodownsp_tiny", fc_dim=960, num_class=5)
    # tiny HRNet emits a single 960-ch level; C1DeepSup's deepsup head reads
    # conv_out[-2], so feed the same features twice via a wrapper list
    dec = C1DeepSup(num_class=5, fc_dim=960)

    class TwoLevel(SegmentationModule):
        def __call__(self, x, train: bool = False):
            feats = self.encoder(x, train=train)
            # deepsup path wants [conv4 (fc_dim//2 ch), conv5]
            conv4 = feats[-1][..., : self.config.fc_dim // 2]
            return self.decoder([conv4, feats[-1]], train=train)

    m = TwoLevel(config=cfg, decoder_module=dec)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert isinstance(out, tuple) and len(out) == 2
    assert out[0].shape == (1, 16, 16, 5) and out[1].shape == (1, 16, 16, 5)

    label = jnp.zeros((1, 16, 16), jnp.int32)

    def crit(pred, y):
        return -jnp.mean(jnp.take_along_axis(pred, y[..., None], axis=-1))

    total = deep_sup_loss(crit, out, label, 0.4)
    expect = crit(out[0], label) + 0.4 * crit(out[1], label)
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)

    probs = m.apply(variables, x, method=TwoLevel.infer)
    assert probs.shape == (1, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
