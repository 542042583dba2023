"""Differentiability guarantees: the segmentation loss must backpropagate
through the warp into the grid/saliency parameters (torch grid_sample
semantics — this is what makes the foveation *learned*)."""

import jax
import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.warp import grid_sample


def test_grid_sample_grad_wrt_grid(rng):
    img = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 4, 4, 2)).astype(np.float32))

    def f(g):
        return jnp.sum(grid_sample(img, g) ** 2)

    g = jax.grad(f)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # gradients reach the grid


def test_seg_loss_grads_reach_saliency_params(rng):
    """End-to-end: grads of the Dice+Focal (warped-domain) loss w.r.t. the
    saliency ('zoom') params are nonzero even WITHOUT the edge loss."""
    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.data.synthetic import make_batch
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.train.step import LossConfig, compute_losses

    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.deform_joint_loss = False  # seg loss only

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc)
    batch = {k: jnp.asarray(v) for k, v in make_batch(np.random.default_rng(0), 2, 64).items()}
    variables = module.init(jax.random.PRNGKey(0), batch["img_data"], batch["focus_point"])
    lcfg = LossConfig.from_cfg(cfg)

    def loss_fn(params):
        out = module.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           batch["img_data"], batch["focus_point"])
        loss, _ = compute_losses(out, batch, lcfg)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    sal = jax.tree.leaves(grads["localization"])
    comp = jax.tree.leaves(grads["net_compress"])
    assert sum(float(jnp.abs(g).sum()) for g in sal) > 0
    assert sum(float(jnp.abs(g).sum()) for g in comp) > 0
