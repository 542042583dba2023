"""Data-parallel correctness on the 8-device virtual CPU mesh.

The TPU-native analogue of the reference's local-2-GPU SyncBN simulation
(lib/nn/modules/tests/test_sync_batchnorm.py): run the sharded train step on
8 virtual devices and check it agrees with the single-device step on the same
global batch.
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


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    return cfg


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_runs_and_syncs(tiny_cfg, rng):
    mesh = make_mesh()
    dc = DeformConfig.from_cfg(tiny_cfg)
    # axis_name enables cross-replica (sync) BN inside the step
    module = DeformSegmentation(config=dc, axis_name="data")
    tx = create_optimizer(tiny_cfg)
    lcfg = LossConfig.from_cfg(tiny_cfg)

    batch_np = make_batch(rng, batch=8, canvas=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    # init without the axis (same param shapes)
    init_module = DeformSegmentation(config=dc)
    state = init_state(init_module, tx, jax.random.PRNGKey(0), batch)
    state = replicate_state(state, mesh)

    pstep = make_parallel_train_step(module, tx, lcfg, mesh)
    sbatch = shard_batch(batch, mesh)
    new_state, mets = pstep(state, sbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(mets["loss"]))
    assert np.isfinite(float(mets["acc"]))
    # params updated
    p0 = jax.tree.leaves(new_state.params)[0]
    assert p0.sharding.is_fully_replicated


def test_sharded_eval_matches_single_device(tiny_cfg, rng):
    """Per-sample-mean eval metrics from the sharded eval step must equal the
    single-device eval on the same global batch (deterministic: no dropout,
    BN uses running stats). Loss terms whose reductions group over the batch
    (edge-loss min-max norm, dice) are per-replica under sharding — the same
    per-rank semantics as the reference's DDP (each rank normalizes over its
    local batch; only gradients are averaged) — so they are not compared."""
    from fovealseg_tpu.parallel.mesh import make_parallel_eval_step
    from fovealseg_tpu.train.step import make_eval_step

    mesh = make_mesh()
    dc = DeformConfig.from_cfg(tiny_cfg)
    module_sync = DeformSegmentation(config=dc, axis_name="data")
    module_single = DeformSegmentation(config=dc)
    tx = create_optimizer(tiny_cfg)
    lcfg = LossConfig.from_cfg(tiny_cfg)

    batch_np = make_batch(rng, batch=8, canvas=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_state(module_single, tx, jax.random.PRNGKey(0), batch)

    sstep = jax.jit(make_eval_step(module_single, lcfg))
    sm = sstep(state.params, state.batch_stats, batch)

    sstate = replicate_state(state, mesh)
    pstep = make_parallel_eval_step(module_sync, lcfg, mesh)
    pm = pstep(sstate.params, sstate.batch_stats, shard_batch(batch, mesh))

    for k in ("acc", "acc_bin_fg", "acc_cls_fbg", "acc_bin_fbg", "focal_loss"):
        np.testing.assert_allclose(float(pm[k]), float(sm[k]), rtol=1e-4, err_msg=k)


def test_gspmd_2d_mesh_matches_single_device(tiny_cfg, rng):
    """2-D (data, model) mesh GSPMD step: wide conv kernels sharded over
    'model', batch over 'data'; one step must match the single-device step
    on the same global batch (GSPMD reductions are global, so batch-grouped
    loss terms agree exactly, unlike the per-replica shard_map DP path)."""
    from fovealseg_tpu.parallel.mesh import (
        make_gspmd_train_step,
        make_mesh_2d,
        shard_state_2d,
        state_shardings_2d,
    )

    mesh = make_mesh_2d(dp=4, mp=2)
    assert mesh.shape == {"data": 4, "model": 2}

    dc = DeformConfig.from_cfg(tiny_cfg)
    module = DeformSegmentation(config=dc)  # no axis_name: reductions implicit
    tx = create_optimizer(tiny_cfg)
    lcfg = LossConfig.from_cfg(tiny_cfg)

    batch_np = make_batch(rng, batch=8, canvas=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)

    # single-device reference step (same rng -> same dropout pattern)
    sstep = jax.jit(make_train_step(module, tx, lcfg))
    s_ref, m_ref = sstep(
        jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(1)
    )

    # some wide kernels actually shard
    shardings = state_shardings_2d(state, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("model" in str(sp) for sp in specs), "nothing sharded over model"

    dstate = shard_state_2d(state, mesh)
    gstep = make_gspmd_train_step(module, tx, lcfg, mesh, dstate)
    d_new, m_2d = gstep(dstate, batch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_2d["loss"]), float(m_ref["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_2d["acc"]), float(m_ref["acc"]), rtol=1e-4)
    # updated params agree with the single-device update
    la = jax.tree.leaves(d_new.params)
    lb = jax.tree.leaves(s_ref.params)
    for a, b in zip(la[:5], lb[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_make_mesh_oversubscription_raises():
    """Requesting more devices than visible must fail loudly, not silently
    truncate (throughput would be misattributed to a bigger mesh)."""
    import jax
    import pytest

    with pytest.raises(ValueError):
        make_mesh(len(jax.devices()) + 1)
