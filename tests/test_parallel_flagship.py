"""PRODUCTION-flagship execution on the 8-device virtual CPU mesh.

tests/test_parallel*.py prove the sharded-step semantics on a tiny model
(16x16 task); this file runs the REAL flagship graph — 80x80 task,
hrnetv2_nodownsp (960-ch concat head, ~130M params), 640px canvas, radius
45, 51 classes — through every multi-device path, because shape-dependent
sharding bugs (a 960-concat axis vs mp, 80-row halos over 8 devices) are
exactly what tiny shapes miss. The reference's corresponding surface is the
2-GPU DDP launch of the same config (train_deform_semantic.py:45-55,
README.md:79).

One full-size step per path, so the file is slow on the 1-CPU host (marked
``slow``): DP shard_map train step, GSPMD dp4xmp2 train step (checked
against the single-device step on the same batch), spatial-8 forward
(checked against the single-device forward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

pytestmark = pytest.mark.slow

CANVAS = 640  # production canvas (640x640 LVIS pad, b2_preprocess_lvis.py:310)


@pytest.fixture(scope="module")
def flagship_cfg():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (80, 80)
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    cfg.MODEL.gaussian_radius = 45
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.MODEL.rev_deform_interp = "nearest"
    cfg.DATASET.segm_downsampling_rate = 1
    return cfg


@pytest.fixture(scope="module")
def flagship_state(flagship_cfg):
    """One init + one batch shared by all paths (the expensive part)."""
    dc = DeformConfig.from_cfg(flagship_cfg)
    tx = create_optimizer(flagship_cfg)
    rng = np.random.default_rng(304)
    batch_np = make_batch(rng, batch=8, canvas=CANVAS)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    module = DeformSegmentation(config=dc)
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    assert n_params > 100e6, f"not the flagship: {n_params/1e6:.1f}M params"
    return dc, tx, state, batch


def test_flagship_dp_step_runs(flagship_cfg, flagship_state):
    """ONE shard_map DP train step of the full flagship (batch 8, one sample
    per device, cross-replica sync-BN + grad pmean)."""
    dc, tx, state, batch = flagship_state
    mesh = make_mesh()
    module = DeformSegmentation(config=dc, axis_name="data")
    lcfg = LossConfig.from_cfg(flagship_cfg)

    pstate = replicate_state(jax.tree.map(jnp.copy, state), mesh)
    pstep = make_parallel_train_step(module, tx, lcfg, mesh)
    new_state, mets = pstep(pstate, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    for k in ("loss", "acc", "edge_loss"):
        assert np.isfinite(float(mets[k])), (k, float(mets[k]))
    p0 = jax.tree.leaves(new_state.params)[0]
    assert p0.sharding.is_fully_replicated


def test_flagship_gspmd_2d_matches_single_device(flagship_cfg, flagship_state):
    """ONE dp4xmp2 GSPMD train step of the full flagship — the 960-ch head
    and wide HRNet kernels sharded over 'model' — must match the
    single-device step on the same batch.

    The step runs the production ``TRAIN.fix_bn`` configuration (eval-mode
    BN, no dropout — gradients still flow, train_deform_semantic.py:69) so
    the comparison is deterministic up to reduction order: at random init
    the flagship's 40+ train-mode BN layers divide by near-zero batch
    variances, amplifying resharded-reduction noise to ~2e-3 on the loss
    (measured), which would say nothing about sharding correctness. The
    train-mode path is covered by test_flagship_dp_step_runs and by the
    tiny-model GSPMD equivalence test (test_parallel.py)."""
    from fovealseg_tpu.parallel.mesh import (
        make_gspmd_train_step,
        make_mesh_2d,
        shard_state_2d,
        state_shardings_2d,
    )

    dc, tx, state, batch = flagship_state
    module = DeformSegmentation(config=dc)
    lcfg = LossConfig.from_cfg(flagship_cfg)

    sstep = jax.jit(make_train_step(module, tx, lcfg, fix_bn=True))
    s_ref, m_ref = sstep(jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(1))

    mesh = make_mesh_2d(dp=4, mp=2)
    shardings = state_shardings_2d(state, mesh)
    specs = [str(s.spec) for s in jax.tree.leaves(shardings)]
    assert any("model" in sp for sp in specs), "nothing sharded over model"

    dstate = shard_state_2d(jax.tree.map(jnp.copy, state), mesh)
    gstep = make_gspmd_train_step(module, tx, lcfg, mesh, dstate, fix_bn=True)
    d_new, m_2d = gstep(dstate, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_2d["loss"]), float(m_ref["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_2d["acc"]), float(m_ref["acc"]), rtol=1e-4)
    # spot-check updated params against the single-device update (first leaves
    # cover conv kernels incl. model-sharded wide ones)
    la, lb = jax.tree.leaves(d_new.params), jax.tree.leaves(s_ref.params)
    for a, b in zip(la[:4], lb[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_flagship_spatial8_matches_single_device(flagship_cfg, flagship_state):
    """Spatial partitioning of the flagship forward: the 80x80 task image's
    columns split over 8 devices (10 each) with XLA conv halo exchanges; the
    warped-domain prediction must match the unsharded forward."""
    from fovealseg_tpu.parallel.mesh import make_mesh_spatial, make_spatial_infer_fn

    dc, _, state, batch = flagship_state
    mesh = make_mesh_spatial()
    _, sfn = make_spatial_infer_fn(dc, mesh)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x1, f1 = batch["img_data"][:1], batch["focus_point"][:1]
    pred_sp = np.asarray(sfn(variables, x1, f1))
    assert np.isfinite(pred_sp).all()

    module = DeformSegmentation(config=dc)
    pred_1 = np.asarray(
        jax.jit(lambda v, x, f: module.apply(v, x, f, train=False)["pred"])(
            variables, x1, f1
        )
    )
    np.testing.assert_allclose(pred_sp, pred_1, rtol=1e-4, atol=1e-5)
