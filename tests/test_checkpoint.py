"""Orbax checkpoint save/restore round-trip + torch import shim mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train import checkpoint as ckpt
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step


@pytest.fixture(scope="module")
def tiny():
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
    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(np.random.default_rng(0), 2, 64).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    return cfg, module, tx, batch, state


def test_checkpoint_roundtrip(tiny, tmp_path):
    cfg, module, tx, batch, state = tiny
    step = jax.jit(make_train_step(module, tx, LossConfig.from_cfg(cfg)))
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    ckpt.save_checkpoint(str(tmp_path), 3, jax.device_get(state2))
    restored = ckpt.load_checkpoint(str(tmp_path), 3, state2)
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == int(state2.step)
    # 'last' mirror exists (epoch_last semantics)
    restored_last = ckpt.load_checkpoint(str(tmp_path), "last", state2)
    assert int(restored_last["step"]) == int(state2.step)


def test_async_save_device_state_roundtrip(tiny, tmp_path):
    """AsyncSaver: device-resident state saved without a prior device_get,
    background write drained, restore bit-equal (TPU.async_checkpoint)."""
    cfg, module, tx, batch, state = tiny
    d = str(tmp_path / "async")
    saver = ckpt.AsyncSaver()
    try:
        ckpt.save_checkpoint(d, 5, state, saver=saver)  # device arrays in
        saver.wait()
        restored = ckpt.load_checkpoint(d, 5, state)
        for a, b in zip(jax.tree.leaves(restored["params"]),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        restored_last = ckpt.load_checkpoint(d, "last", state)
        assert int(restored_last["step"]) == int(state.step)
    finally:
        saver.close()


def test_sharded_2d_state_save_restore_with_shardings(tiny, tmp_path):
    """2-D (data, model) mesh TrainState: save the SHARDED state (async,
    no host gather), restore WITH shardings — every leaf comes back on
    device in its training sharding, bit-equal (round-3 verdict item 4:
    the GSPMD scaling path's checkpoint story, previously host-side only)."""
    from fovealseg_tpu.parallel.mesh import (
        make_mesh_2d,
        shard_state_2d,
        state_shardings_2d,
    )

    cfg, module, tx, batch, state = tiny
    mesh = make_mesh_2d(dp=4, mp=2)
    sstate = shard_state_2d(state, mesh)
    shardings = state_shardings_2d(state, mesh)
    d = str(tmp_path / "sharded")
    saver = ckpt.AsyncSaver()
    try:
        ckpt.save_checkpoint(d, 2, sstate, saver=saver)
        saver.wait()
    finally:
        saver.close()
    restored = ckpt.load_checkpoint(d, 2, state, shardings=shardings)
    # at least one wide kernel actually model-sharded (not a vacuous test)
    sharded_leaves = [
        l for l in jax.tree.leaves(restored["params"])
        if not l.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no leaf restored with a model sharding"
    for a, b, s in zip(
        jax.tree.leaves(restored["params"]),
        jax.tree.leaves(state.params),
        jax.tree.leaves(shardings.params),
    ):
        assert a.sharding == s  # restored directly into the training sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state + step survive too
    assert int(restored["step"]) == int(state.step)


def test_torch_import_unknown_keys_skipped(tiny):
    _, module, tx, batch, state = tiny
    from fovealseg_tpu.train.checkpoint import import_torch_state_dict

    sd = {"saliency": {"totally.bogus.weight": np.zeros((3, 3), np.float32)}}
    p2, s2 = import_torch_state_dict(sd, dict(state.params), dict(state.batch_stats))
    # strict=False semantics: unknown keys skipped, tree unchanged
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_only_last_writes_no_numbered_dir(tiny, tmp_path):
    # off-cadence epochs must refresh only epoch_last (reference keeps only
    # the *_last.pth copies between cadence epochs,
    # train_deform_semantic.py:166-208) — no per-epoch disk growth
    cfg, module, tx, batch, state = tiny
    d = str(tmp_path / "cadence")
    ckpt.save_checkpoint(d, 7, jax.device_get(state), only_last=True)
    import os

    entries = sorted(os.listdir(d))
    assert "epoch_last" in entries
    assert not any(e.startswith("epoch_7") for e in entries), entries
    restored = ckpt.load_checkpoint(d, "last", state)
    assert int(restored["step"]) == int(state.step)


def test_torch_export_roundtrip(tiny, tmp_path):
    # save_torch_checkpoint writes the reference's 4-file surface and the
    # import shim recovers the exact flax state (bit-exact inverse pair)
    import os

    _, module, tx, batch, state = tiny
    d = str(tmp_path / "torch_export")
    paths = ckpt.save_torch_checkpoint(d, 7, state.params, state.batch_stats)
    names = {os.path.basename(p) for p in paths}
    for kind in ("encoder", "decoder", "saliency", "compress"):
        assert f"{kind}_epoch_7.pth" in names, names
        assert f"{kind}_epoch_last.pth" in names, names
    zero_p = jax.tree.map(jnp.zeros_like, state.params)
    zero_s = jax.tree.map(jnp.zeros_like, state.batch_stats)
    p2, s2 = ckpt.load_torch_checkpoint(d, 7, zero_p, zero_s)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s2), jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_export_strict_into_reference_fovsim():
    # the exported saliency .pth loads into the reference's own FovSimModule
    # with no unexpected keys (missing = SyncBN thread-pipe internals only)
    # and reproduces our forward exactly — the migration-back guarantee
    torch = pytest.importorskip("torch")
    from tests.ref_oracle import load_ref_module

    sal = load_ref_module("saliency_network.py", "ref_saliency")
    tm = sal.FovSimModule(cfg=None, in_channels=5, out_channels=24).eval()
    from fovealseg_tpu.models.saliency import FovSimModule

    fm = FovSimModule()
    x = np.random.default_rng(3).standard_normal((2, 12, 12, 5)).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(1), jnp.asarray(x))
    sds = ckpt.export_torch_state_dict(
        {"localization": variables["params"]},
        {"localization": variables.get("batch_stats", {})},
    )
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sds["saliency"].items()}
    res = tm.load_state_dict(sd, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    internals = ("_tmp_running_mean", "_tmp_running_var", "_running_iter")
    assert all(k.endswith(internals) for k in res.missing_keys), res.missing_keys
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_torch_export_logs_dropped_leaves_and_root_stats(caplog):
    # ADVICE r2: (a) a param leaf with no torch mapping must be logged, not
    # silently dropped; (b) a mean/var leaf at a subtree ROOT must produce
    # 'running_mean', not '.running_mean'
    import logging

    params = {"encoder": {"kernel": np.ones((3, 3, 2, 4), np.float32),
                          "mystery_leaf": np.ones((5,), np.float32)}}
    stats = {"encoder": {"mean": np.zeros((4,), np.float32),
                         "var": np.ones((4,), np.float32)}}
    with caplog.at_level(logging.WARNING):
        sds = ckpt.export_torch_state_dict(params, stats)
    assert "encoder.mystery_leaf" in caplog.text
    assert set(sds["encoder"]) == {
        "weight", "running_mean", "running_var", "num_batches_tracked"
    }, sorted(sds["encoder"])
