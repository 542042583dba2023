"""MODEL.uniform_sample baselines and the staged edge-only training window.

The uniform-downsample ablation bypasses the warp with plain resizes
(/root/reference/models/models.py:875-878, 904-906, 930-931;
models_instance.py:848-849, 862-880) and the TRAIN.opt_deform_LabelEdge
fix_seg window trains on the edge loss alone (models/models.py:899-901).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.core.interpolate import resize_bilinear, resize_nearest
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.step import LossConfig, compute_losses


@pytest.fixture(scope="module")
def cfg0():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.MODEL.rev_deform_interp = "nearest"
    return cfg


@pytest.fixture(scope="module")
def batch():
    b = make_batch(np.random.default_rng(3), batch=2, canvas=64)
    return {k: jnp.asarray(v) for k, v in b.items()}


def _build(cfg, batch):
    module = DeformSegmentation(config=DeformConfig.from_cfg(cfg))
    params = module.init(jax.random.PRNGKey(0), batch["img_data"], batch["focus_point"])
    return module, params


def test_uniform_bi_train_forward_bypasses_warp(cfg0, batch):
    cfg = cfg0.clone()
    cfg.MODEL.uniform_sample = "BI"
    module, params = _build(cfg, batch)
    out = module.apply(params, batch["img_data"], batch["focus_point"])
    # x_sampled is the plain bilinear downsample (models.py:904-906)
    expect = resize_bilinear(batch["img_data"], (16, 16))
    np.testing.assert_allclose(
        np.asarray(out["x_sampled"]), np.asarray(expect), rtol=1e-6, atol=1e-6
    )
    # the xs the grid saw is uniform; xs_our is the live prediction
    assert float(jnp.ptp(out["xs"])) == 0.0
    assert float(jnp.ptp(out["xs_our"])) > 0.0
    # y_sampled in the loss is the bilinear label downsample (models.py:875-878)
    lcfg = LossConfig.from_cfg(cfg)
    assert lcfg.uniform_bi
    loss, mets = compute_losses(out, batch, lcfg)
    assert np.isfinite(float(loss))


def test_uniform_bi_infer_plain_upsample(cfg0, batch):
    cfg = cfg0.clone()
    cfg.MODEL.uniform_sample = "BI"
    module, params = _build(cfg, batch)
    out = module.apply(
        params, batch["img_data"], batch["focus_point"],
        y=batch["seg_label"], y_sampled_reverse=True, x_sampled_reverse=True,
        argmax_labels=True, method=DeformSegmentation.infer,
    )
    seg_hw = batch["img_data"].shape[1:3]
    # pred_sampled is the plain bilinear upsample of pred (instance:868-871)
    expect = resize_bilinear(out["pred"].astype(jnp.float32), seg_hw)
    np.testing.assert_allclose(
        np.asarray(out["pred_sampled"]), np.asarray(expect), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["pred_label"]), np.argmax(np.asarray(expect), axis=-1)
    )
    # y round trip: bilinear down + trunc, nearest up (instance:862-877)
    y_s = jnp.floor(resize_bilinear(batch["seg_label"].astype(jnp.float32)[..., None], (16, 16)))
    np.testing.assert_array_equal(np.asarray(out["y_sampled"]), np.asarray(y_s[..., 0]))
    np.testing.assert_array_equal(
        np.asarray(out["y_sampled_reverse"]),
        np.asarray(resize_nearest(y_s, seg_hw)[..., 0]),
    )
    # x round trip: bilinear upsample of the uniform downsample (:878-880)
    np.testing.assert_allclose(
        np.asarray(out["x_sampled_reverse"]),
        np.asarray(resize_bilinear(out["x_sampled"].astype(jnp.float32), seg_hw)),
        rtol=1e-5, atol=1e-5,
    )


def test_uniform_nearest_infer_upsample(cfg0, batch):
    cfg = cfg0.clone()
    cfg.MODEL.uniform_sample = "nearest"
    module, params = _build(cfg, batch)
    out = module.apply(
        params, batch["img_data"], batch["focus_point"],
        method=DeformSegmentation.infer,
    )
    # uniform 'nearest' keeps the (uniform-grid) warp for x_sampled but the
    # inverse warp is a nearest upsample (instance:868-874)
    seg_hw = batch["img_data"].shape[1:3]
    expect = resize_nearest(out["pred"].astype(jnp.float32), seg_hw)
    np.testing.assert_array_equal(np.asarray(out["pred_sampled"]), np.asarray(expect))


def test_edge_only_window_gates_loss(cfg0, batch):
    """batch['edge_only']=True makes the total loss the edge loss alone and
    zeroes the seg gradient (models/models.py:899-901)."""
    module, params = _build(cfg0, batch)
    lcfg = LossConfig.from_cfg(cfg0)
    out = module.apply(params, batch["img_data"], batch["focus_point"])
    b_on = dict(batch, edge_only=jnp.bool_(True))
    b_off = dict(batch, edge_only=jnp.bool_(False))
    loss_on, mets_on = compute_losses(out, b_on, lcfg)
    loss_off, mets_off = compute_losses(out, b_off, lcfg)
    np.testing.assert_allclose(float(loss_on), float(mets_on["edge_loss"]), rtol=1e-6)
    assert float(loss_off) > float(loss_on)  # dice+focal(+edge) > edge alone

    # gradient wrt pred vanishes under the window (the seg loss is gated out)
    def loss_wrt_pred(pred, eo):
        o = dict(out, pred=pred)
        return compute_losses(o, dict(batch, edge_only=eo), lcfg)[0]

    g_on = jax.grad(loss_wrt_pred)(out["pred"].astype(jnp.float32), jnp.bool_(True))
    g_off = jax.grad(loss_wrt_pred)(out["pred"].astype(jnp.float32), jnp.bool_(False))
    assert float(jnp.abs(g_on).max()) == 0.0
    assert float(jnp.abs(g_off).max()) > 0.0


def test_stage_adjust_edge_loss_sticky(cfg0):
    """The reference's in-window cfg mutation persists after the window
    (train_deform_semantic.py:86-89)."""
    from fovealseg_tpu.train.optim import edge_loss_scale_at

    cfg = cfg0.clone()
    cfg.TRAIN.edge_loss_scale = 100.0
    cfg.TRAIN.stage_adjust_edge_loss = 3.0
    cfg.TRAIN.adjust_edge_loss_start_epoch = 5
    cfg.TRAIN.adjust_edge_loss_end_epoch = 7
    assert edge_loss_scale_at(cfg, 0, epoch=4) == 100.0  # before: static
    assert edge_loss_scale_at(cfg, 0, epoch=6) == 3.0    # in-window: stage
    assert edge_loss_scale_at(cfg, 0, epoch=9) == 3.0    # after: sticky
    # the fixed_edge_loss_scale poly branch overwrites the mutation each iter
    cfg.TRAIN.fixed_edge_loss_scale = 50.0
    cfg.TRAIN.max_iters = 100
    assert edge_loss_scale_at(cfg, 0, epoch=9) == pytest.approx(50.0)
