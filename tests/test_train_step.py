"""End-to-end train-step smoke: loss decreases on a tiny overfit problem."""

import dataclasses

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


def test_bf16_compute_convergence_matches_f32():
    """TPU.compute_dtype=bfloat16 (the new default) optimizes the joint loss
    comparably to float32 on a fixed tiny batch (the on-chip validation is
    benchmarks/train_dtype.py; this is the CI-scale guard)."""
    import jax

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.data.synthetic import make_batch
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.lr_encoder = 1e-3
    cfg.TRAIN.lr_decoder = 1e-3
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960

    rng = np.random.default_rng(0)
    batch_np = make_batch(rng, batch=2, canvas=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    finals = {}
    for name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        dc = DeformConfig.from_cfg(cfg)
        module = DeformSegmentation(config=dc, dtype=dtype)
        tx = create_optimizer(cfg)
        state = init_state(module, tx, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(module, tx, LossConfig.from_cfg(cfg)))
        losses = []
        # fixed dropout key -> a deterministic objective that must decrease
        for _ in range(15):
            state, mets = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(mets["loss"]))
        finals[name] = losses

    for name, losses in finals.items():
        assert np.isfinite(losses[-1]), (name, losses[-1])
        assert min(losses[-5:]) < losses[0], f"{name} loss flat: {losses[0]} -> {losses[-5:]}"
    # the two dtypes track each other on this protocol
    assert abs(finals["bfloat16"][-1] - finals["float32"][-1]) < 0.5 * finals["float32"][0]


def test_dropout_rng_impl_rbg_step():
    """TPU.dropout_rng_impl=rbg (default): the train step accepts typed rbg
    keys (threefry mask generation costs ~106 ms of the 198 ms b16 step
    on-chip; rbg is the TPU-fast generator)."""
    import jax

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.data.synthetic import make_batch
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

    cfg = get_default_cfg()
    assert cfg.TPU.dropout_rng_impl == "rbg"
    cfg.DATASET.num_class = 51
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.TRAIN.optim = "adam"
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(cfg)
    rng = np.random.default_rng(3)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, batch=2, canvas=64).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(module, tx, LossConfig.from_cfg(cfg)))
    _, mets = step(state, batch, jax.random.key(1, impl=cfg.TPU.dropout_rng_impl))
    assert np.isfinite(float(mets["loss"]))


def test_fix_bn_freezes_batch_stats(tiny_cfg, rng):
    """TRAIN.fix_bn: the reference trains the module in eval mode
    (train_deform_semantic.py:69) — BN running stats must not move while
    params still update."""
    dc = DeformConfig.from_cfg(tiny_cfg)
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(tiny_cfg)
    lcfg = LossConfig.from_cfg(tiny_cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, batch=2, canvas=64).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(module, tx, lcfg, fix_bn=True))
    new_state, mets = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(mets["loss"]))
    # stats untouched bit-for-bit
    for a, b in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params did update
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params))]
    assert max(diffs) > 0


def test_gt_gradient_label_edge_sampler(tiny_cfg, rng):
    """MODEL.gt_gradient + fix_gt_gradient: the GRID is driven by the
    label-edge map, detached — the seg loss reaches no saliency param — but
    the norm edge loss still trains the saliency nets through the
    pre-override prediction (the reference's xs_our clone,
    models/models.py:726, 735-773, 886-891)."""
    cfg = tiny_cfg.clone()
    cfg.MODEL.gt_gradient = True
    cfg.MODEL.fix_gt_gradient = True
    dc = DeformConfig.from_cfg(cfg)
    assert dc.gt_gradient and dc.fix_gt_gradient
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, batch=2, canvas=64).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(module, tx, lcfg))
    new_state, mets = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(mets["loss"]))
    from fovealseg_tpu.train.step import compute_losses

    def make_loss_fn(lc):
        def loss_fn(params):
            out, _ = module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img_data"], batch["focus_point"], train=True,
                y=batch["seg_label"], rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return compute_losses(out, batch, lc)[0]

        return loss_fn

    # seg loss only (joint edge loss off): the saliency branch
    # (localization + compress) gets exactly zero gradient — the grid is
    # detached (the torch-Adam-style additive weight decay still moves the
    # params, so compare grads, not params)
    lc_seg = dataclasses.replace(lcfg, deform_joint_loss=False)
    g = jax.jit(jax.grad(make_loss_fn(lc_seg)))(state.params)
    for sub in ("localization", "net_compress"):
        assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g[sub])) == 0.0
    # ... while the segmentation branch does learn
    assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g["encoder"])) > 0.0
    # with the joint (norm) edge loss on, gradients DO reach the saliency
    # nets through xs_our even though the grid saw the override
    g2 = jax.jit(jax.grad(make_loss_fn(lcfg)))(state.params)
    for sub in ("localization", "net_compress"):
        assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g2[sub])) > 0.0
    # the xs the grid saw is the label-edge map, not the net's prediction
    out_gt = module.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["img_data"], batch["focus_point"], train=False,
        y=batch["seg_label"],
    )
    plain = DeformSegmentation(config=DeformConfig.from_cfg(tiny_cfg))
    out_plain = plain.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["img_data"], batch["focus_point"], train=False,
    )
    assert not np.allclose(np.asarray(out_gt["xs"]), np.asarray(out_plain["xs"]))


def test_loss_at_high_res(tiny_cfg, rng):
    """MODEL.loss_at_high_res: the seg loss is computed on the inverse-warped
    full-res prediction (models_instance.py:686-786) and still trains."""
    cfg = tiny_cfg.clone()
    cfg.MODEL.loss_at_high_res = True
    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, batch=2, canvas=64).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    out = module.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["img_data"], batch["focus_point"], train=False,
    )
    assert out["pred_hr"].shape == (2, 64, 64, 51)
    step = jax.jit(make_train_step(module, tx, lcfg))
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, mets = step(state, batch, sub)
        losses.append(float(mets["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
