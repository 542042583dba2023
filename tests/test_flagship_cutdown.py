"""Cut-down flagship mesh regression — IN the default suite (verdict r3 #6).

The full flagship mesh trio (tests/test_parallel_flagship.py) takes ~55 min
on this 1-CPU host and is slow-marked, so nothing re-ran it on a cadence.
This file keeps the two shape hazards the tiny 16x16 twin cannot see —
(a) the 960-channel concat head sharded over 'model' on the 2-D GSPMD mesh
and (b) the 80-row task image sharded over 8 'spatial' devices with conv
halos — while cutting the DEPTH only: ``hrnetv2_nodownsp_tiny`` uses the
same stage channel plan 64/128/256/512 -> 960 (models/hrnet.py STAGE2-4
constants) with stage_modules (1,1,1) x 1 block, at the REAL flagship
geometry (80x80 task, 640px canvas, radius 45, 51 classes, fc_dim 960).
A 960-concat/mp-split or halo regression fails here in minutes instead of
waiting for a manual slow-suite run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_eval_step

CANVAS = 640


@pytest.fixture(scope="module")
def cutdown():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (80, 80)       # real task geometry
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    cfg.MODEL.gaussian_radius = 45
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"  # real channels, depth cut
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.MODEL.rev_deform_interp = "nearest"
    cfg.DATASET.segm_downsampling_rate = 1

    dc = DeformConfig.from_cfg(cfg)
    tx = create_optimizer(cfg)
    batch_np = make_batch(np.random.default_rng(304), batch=4, canvas=CANVAS)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    module = DeformSegmentation(config=dc)
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    lcfg = LossConfig.from_cfg(cfg)
    sm = jax.jit(make_eval_step(module, lcfg))(state.params, state.batch_stats, batch)
    return cfg, dc, state, batch, lcfg, sm


def test_gspmd_2d_eval_matches_single_device(cutdown):
    """dp2 x mp2 GSPMD eval step at 960-ch/80-task geometry == single-device
    (global reductions -> exact agreement expectations as the full flagship
    test, at ~1/12 the depth)."""
    from fovealseg_tpu.parallel.mesh import (
        make_gspmd_eval_step,
        make_mesh_2d,
        shard_state_2d,
    )

    cfg, dc, state, batch, lcfg, sm = cutdown
    mesh = make_mesh_2d(dp=2, mp=2)
    module = DeformSegmentation(config=dc)
    sstate = shard_state_2d(state, mesh)
    # the hazard under test: 960-wide kernels actually split over 'model'
    n_model_sharded = sum(
        1 for l in jax.tree.leaves(sstate.params) if not l.sharding.is_fully_replicated
    )
    assert n_model_sharded > 0, "no 960-ch kernel was model-sharded"
    pstep = make_gspmd_eval_step(module, lcfg, mesh, sstate)
    pm = pstep(sstate.params, sstate.batch_stats, batch)
    # Tolerance derivation (measured, round 5): splitting the 960-ch head
    # contraction over mp=2 reassociates each f32 dot into two 480-ch partial
    # sums + psum, perturbing logits by <=5.7e-4 abs (~2.9e-4 rel at p99.9)
    # vs the single-device forward; focal(gamma=5) at near-uniform init
    # amplifies that to ~2.2e-4 rel on the summed loss. edge_loss bypasses
    # the mp-sharded head and agrees to 8e-8, confirming the metric
    # reductions themselves are exact. rtol 5e-4 = 2.3x the measured
    # reassociation envelope, still ~200x below a real 960-concat/mp
    # regression (which shifts the loss by >1e-1).
    np.testing.assert_allclose(float(pm["loss"]), float(sm["loss"]),
                               rtol=5e-4, err_msg="loss")
    np.testing.assert_allclose(float(pm["edge_loss"]), float(sm["edge_loss"]),
                               rtol=2e-4, err_msg="edge_loss")
    # accuracy metrics count argmax/threshold decisions: mp-shard reduction
    # order flips a handful of boundary pixels (measured ~4e-4 of 25.6k);
    # a real 960-concat/mp regression shifts these by >1e-1
    for k in ("acc", "acc_bin_fg", "acc_cls_fbg", "acc_bin_fbg"):
        np.testing.assert_allclose(
            float(pm[k]), float(sm[k]), atol=2e-3, err_msg=k
        )


def test_spatial_8_forward_matches_single_device(cutdown):
    """80 task rows over 8 'spatial' devices (10-row shards + 3x3 halos)
    must reproduce the single-device warped-domain forward."""
    from fovealseg_tpu.parallel.mesh import make_mesh_spatial, make_spatial_infer_fn

    cfg, dc, state, batch, lcfg, sm = cutdown
    module = DeformSegmentation(config=dc)
    ref = jax.jit(
        lambda v, x, f: module.apply(v, x, f, train=False)["pred"]
    )(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["img_data"][:1], batch["focus_point"][:1],
    )
    smesh = make_mesh_spatial(8)
    _, sfn = make_spatial_infer_fn(dc, smesh)
    got = sfn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["img_data"][:1], batch["focus_point"][:1],
    )
    # halo-exchange reassociation noise is ~1e-4 on these logits; a halo
    # regression produces O(1) row-boundary garbage
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=5e-4)
