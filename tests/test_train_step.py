"""End-to-end train-step smoke: loss decreases on a tiny overfit problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.optim import create_optimizer, make_stage_schedules
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    cfg.TRAIN.epoch_iters = 10
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    # boost LR for the overfit smoke
    cfg.TRAIN.lr_mult_encoder = 0.01
    cfg.TRAIN.lr_mult_decoder = 0.01
    cfg.TRAIN.lr_mult_saliency = 0.01
    cfg.TRAIN.lr_mult_compress = 0.01
    return cfg


def test_overfit_smoke(tiny_cfg, rng):
    dc = DeformConfig.from_cfg(tiny_cfg)
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(tiny_cfg)
    lcfg = LossConfig.from_cfg(tiny_cfg)

    batch_np = make_batch(rng, batch=2, canvas=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(module, tx, lcfg))

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, mets = step(state, batch, sub)
        losses.append(float(mets["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    for k in ("acc", "acc_bin_fg", "acc_cls_fbg", "acc_bin_fbg", "edge_loss"):
        assert np.isfinite(float(mets[k]))


def test_stage_lr_schedule(tiny_cfg):
    sched = make_stage_schedules(tiny_cfg)
    iters = tiny_cfg.TRAIN.epoch_iters
    n = tiny_cfg.TRAIN.deform_pretrain  # 100
    # epoch 1 -> 0.1 ; epoch 100 -> 0.01 ; epoch 200 -> 0.001
    assert np.isclose(float(sched.lr_class(jnp.asarray(0))), 0.1)
    assert np.isclose(float(sched.lr_zoom(jnp.asarray(0))), 0.1)
    assert np.isclose(float(sched.lr_class(jnp.asarray((n - 1) * iters))), 0.01)
    assert np.isclose(float(sched.lr_class(jnp.asarray((2 * n - 1) * iters))), 0.001)


def test_stage_lr_schedule_scale_by_iter(tiny_cfg):
    # with scale_by_iter the reference divides cur_iter by
    # deform_pretrain * epoch_iters (train_deform_semantic.py:321-323)
    cfg = tiny_cfg.clone()
    cfg.TRAIN.scale_by_iter = True
    sched = make_stage_schedules(cfg)
    iters = cfg.TRAIN.epoch_iters
    n = cfg.TRAIN.deform_pretrain * iters
    assert np.isclose(float(sched.lr_class(jnp.asarray(0))), 0.1)
    assert np.isclose(float(sched.lr_class(jnp.asarray(n - 1))), 0.1)
    assert np.isclose(float(sched.lr_class(jnp.asarray(n))), 0.01)
    assert np.isclose(float(sched.lr_zoom(jnp.asarray(2 * n))), 0.001)
