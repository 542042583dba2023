"""Flagship-scale published-checkpoint drill (round-4 verdict #5).

The cutdown round-trip tests (tests/test_checkpoint.py, tiny shapes) prove
the torch import/export shim is bit-exact; this drill proves the SAME flow
at the production flagship config — 640x640 canvas, 80x80 task, 51 classes,
HRNetV2-nodownsp, gaussian_radius 45 (the published eval command,
/root/reference/README.md:73) — end to end:

  1. train STEPS real steps of the production train step (joint
     Dice+Focal+edge loss, 4-group Adam) on device-generated synthetic data;
  2. save the orbax checkpoint (train/checkpoint.py::save_checkpoint, the
     production 4-subtree layout) and restore it into a freshly initialized
     state — the auto-resume path;
  3. export the reference's 4-file ``.pth`` surface
     ({saliency,compress,encoder,decoder}_epoch_120.pth — filename grammar
     of train_deform_semantic.py:166-208) from the restored state and
     reload it through ``load_torch_weight_files`` into ANOTHER freshly
     (differently) initialized state — the published-checkpoint import path
     of /root/reference/eval.py:456-487;
  4. assert the torch-roundtripped params/batch_stats are BIT-EXACT vs the
     orbax-restored ones, then run the full-res argmax serving eval
     (forward warp -> segment -> inverse warp to 640^2) on held-out batches
     for both states and assert the per-batch fg-IoU metric arrays are
     identical.

Usage:  python benchmarks/flagship_ckpt_drill.py          (TPU, ~5 min warm)
        PLATFORM=cpu TRAIN_BATCH=2 STEPS=3 EVAL_BATCHES=2 \
            python benchmarks/flagship_ckpt_drill.py      (slow, no TPU)
Env: STEPS (default 20), TRAIN_BATCH (default 16), EVAL_BATCHES (default 4),
OUT (result json, default benchmarks/results/flagship_ckpt_drill.json).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch_device
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.checkpoint import (
    load_checkpoint,
    load_torch_weight_files,
    save_checkpoint,
    save_torch_checkpoint,
)
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

BATCH = int(os.environ.get("TRAIN_BATCH", "16"))
STEPS = int(os.environ.get("STEPS", "20"))
EVAL_BATCHES = int(os.environ.get("EVAL_BATCHES", "4"))
NUM_FG = 50
BG = NUM_FG
CANVAS = 640


def _flagship_cfg():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = NUM_FG + 1
    cfg.TRAIN.task_input_size = (80, 80)
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.MODEL.gaussian_radius = 45
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.MODEL.rev_deform_interp = "nearest"
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    return cfg


def _eval_metrics(module, state, n_batches):
    """Per-batch full-res fg IoU through the real argmax serving path."""

    @jax.jit
    def eval_one(params, batch_stats, i):
        b = make_batch_device(
            jax.random.fold_in(jax.random.PRNGKey(7), -(1 + i)), BATCH, CANVAS, NUM_FG
        )
        out = module.apply(
            {"params": params, "batch_stats": batch_stats},
            b["img_data"], b["focus_point"],
            argmax_labels=True, method=DeformSegmentation.infer,
        )
        pred = out["pred_label"].astype(jnp.int32)
        mask = b["seg_label"] > 0.5
        cls = b["cls_label"][:, None, None]
        hit = pred == cls
        inter = jnp.sum(hit & mask, axis=(1, 2)).astype(jnp.float32)
        union = jnp.sum(hit | mask, axis=(1, 2)).astype(jnp.float32)
        return jnp.mean(inter / jnp.maximum(union, 1.0))

    return np.asarray(
        [float(eval_one(state["params"], state["batch_stats"], jnp.int32(i)))
         for i in range(n_batches)]
    )


def main():
    import tempfile

    cfg = _flagship_cfg()
    module = DeformSegmentation(config=DeformConfig.from_cfg(cfg), dtype=jnp.bfloat16)
    tx = create_optimizer(cfg)
    step = make_train_step(module, tx, LossConfig.from_cfg(cfg))
    drop_key = jax.random.key(1, impl=cfg.TPU.dropout_rng_impl)
    data_key = jax.random.PRNGKey(7)

    sample = make_batch_device(jax.random.fold_in(data_key, 0), BATCH, CANVAS, NUM_FG)
    state = init_state(module, tx, jax.random.PRNGKey(0), jax.device_get(sample))

    @jax.jit
    def train_n(state):
        def body(st, i):
            b = make_batch_device(jax.random.fold_in(data_key, 1 + i), BATCH, CANVAS, NUM_FG)
            st, mets = step(st, b, jax.random.fold_in(drop_key, i))
            return st, mets["loss"]

        return jax.lax.scan(body, state, jnp.arange(STEPS))

    state, losses = train_n(state)
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses)), losses

    with tempfile.TemporaryDirectory() as tmp:
        # 2. orbax production save -> restore (the auto-resume path)
        ck_dir = os.path.join(tmp, "orbax")
        host_state = jax.device_get(state)
        save_checkpoint(ck_dir, 120, host_state)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), host_state
        )
        restored = load_checkpoint(ck_dir, 120, abstract)

        # 3. export the published 4-file .pth surface and reload it into a
        #    DIFFERENTLY-seeded fresh state (proves the weights, not luck)
        pth_dir = os.path.join(tmp, "lvis_50cls")
        written = save_torch_checkpoint(
            pth_dir, 120, restored["params"], restored["batch_stats"], also_last=False
        )
        names = sorted(os.path.basename(p) for p in written)
        assert names == sorted(
            f"{k}_epoch_120.pth" for k in ("saliency", "compress", "encoder", "decoder")
        ), names
        other = init_state(module, tx, jax.random.PRNGKey(99), jax.device_get(sample))
        params_t, stats_t = load_torch_weight_files(
            {k: os.path.join(pth_dir, f"{k}_epoch_120.pth")
             for k in ("encoder", "decoder", "saliency", "compress")},
            jax.device_get(other.params), jax.device_get(other.batch_stats),
        )

        # 4a. bit-exactness of the torch round trip vs the orbax restore
        mismatches = []
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                {"params": restored["params"], "batch_stats": restored["batch_stats"]}
            ),
            jax.tree_util.tree_leaves_with_path(
                {"params": params_t, "batch_stats": stats_t}
            ),
        ):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                mismatches.append(jax.tree_util.keystr(kp))
        assert not mismatches, f"torch round-trip not bit-exact: {mismatches[:10]}"
        n_leaves = len(jax.tree.leaves(restored["params"])) + len(
            jax.tree.leaves(restored["batch_stats"])
        )

        # 4b. full-res serving eval equality
        iou_orbax = _eval_metrics(module, restored, EVAL_BATCHES)
        iou_torch = _eval_metrics(
            module, {"params": params_t, "batch_stats": stats_t}, EVAL_BATCHES
        )
    assert np.array_equal(iou_orbax, iou_torch), (iou_orbax, iou_torch)

    res = {
        "config": "flagship 640^2 -> 80x80, 51-class, hrnetv2_nodownsp, r45",
        "platform": jax.devices()[0].platform,
        "batch": BATCH,
        "steps": STEPS,
        "train_loss_first_last": [float(losses[0]), float(losses[-1])],
        "param_leaves_bit_exact": n_leaves,
        "eval_batches": EVAL_BATCHES,
        "fg_iou_orbax": [round(float(v), 6) for v in iou_orbax],
        "fg_iou_torch_roundtrip": [round(float(v), 6) for v in iou_torch],
        "iou_equal": True,
    }
    out = os.environ.get(
        "OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "results", "flagship_ckpt_drill.json"),
    )
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
