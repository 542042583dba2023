"""Non-default edge-target training modes: opt_deform_LabelEdge_norm=False
(PIL-style target) and MODEL.gt_gradient (fixed edge-based sampler)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.core.edges import edge_target_pil_style
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.step import LossConfig, compute_losses


@pytest.fixture(scope="module")
def setup():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.deform_joint_loss = True
    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc)
    batch = {k: jnp.asarray(v) for k, v in make_batch(np.random.default_rng(0), 2, 64).items()}
    params = module.init(jax.random.PRNGKey(0), batch["img_data"], batch["focus_point"])
    return cfg, module, params, batch


def test_non_norm_edge_loss(setup):
    cfg, module, params, batch = setup
    cfg = cfg.clone()
    cfg.TRAIN.opt_deform_LabelEdge_norm = False
    cfg.TRAIN.deform_zero_bound = True
    out = module.apply(params, batch["img_data"], batch["focus_point"])
    loss, mets = compute_losses(out, batch, LossConfig.from_cfg(cfg))
    assert np.isfinite(float(loss)) and np.isfinite(float(mets["edge_loss"]))


def test_gt_gradient_override(setup):
    cfg, module, params, batch = setup
    xs_fixed = edge_target_pil_style(batch["seg_label"], (16, 16), (16, 16))
    out = module.apply(params, batch["img_data"], batch["focus_point"], xs_override=xs_fixed)
    assert np.isfinite(np.asarray(out["pred"])).all()
    np.testing.assert_allclose(np.asarray(out["xs"]), np.asarray(xs_fixed))
    # grid stays in range even where the override saliency is all-zero
    g = np.asarray(out["grid"])
    assert (g >= -1.0 - 1e-6).all() and (g <= 1.0 + 1e-6).all()
