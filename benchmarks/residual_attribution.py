"""Attribute the staged-recipe residual fg-IoU gap (round-3 verdict weak #3).

The staged 92k checkpoint evaluates at fg IoU 0.882 on the held-out stream
(benchmarks/results/staged_eval_51cls_92k.json); the residual 0.118 was
asserted to be "localization/boundary error" without decomposition. This
script separates it, on the SAME 32 held-out batches, into:

  1. ``fullres_model_iou``   — pred_label vs full-res GT (reproduces 0.882);
  2. ``intrinsic_ceiling``   — the label round trip GT -> warp (grid_y,
     nearest) -> argmax inverse warp (VAL.y_sampled_reverse semantics,
     deform_module.infer / reference models_instance.py:875-933) scored vs
     the full-res GT. Model-independent given the model's own grids: no
     segmentation network can beat this through the same warp.
  3. ``warped_model_iou``    — argmax(pred) vs y_sampled on the 80x80 task
     domain (model error before any inverse-warp loss).

residual = 1 - fullres_model_iou then splits as
  warp floor     = 1 - intrinsic_ceiling                 (un-fixable by training)
  model residual = intrinsic_ceiling - fullres_model_iou (training headroom)

Usage: SAVE_DIR=/tmp/conv51_staged_ckpt python benchmarks/residual_attribution.py
Knobs mirror convergence_eval.py (TRAIN_BATCH, NUM_FG, EVAL_BATCHES).

TASK_EVAL=N evaluates the SAME 80x80-trained checkpoint with the inference
task grid at NxN (TRAIN.task_input_size_eval — the reference's
input_size_net_infer re_initialise surface, models/models.py:557-592): the
convs are resolution-agnostic, the grid solver rebuilds the grid at the eval
size, and a larger task grid decimates less -> higher intrinsic ceiling.
This is the cheapest at-scale lever against the warp floor (no retraining).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch_device
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import init_state

BATCH = int(os.environ.get("TRAIN_BATCH", "16"))
CANVAS = 640
NUM_FG = int(os.environ.get("NUM_FG", "50"))
BG = NUM_FG
N_BATCHES = int(os.environ.get("EVAL_BATCHES", "32"))
TASK_EVAL = int(os.environ.get("TASK_EVAL", "0"))  # 0 = train size (80)


def main():
    save_dir = os.environ["SAVE_DIR"]
    cfg = get_default_cfg()
    cfg.DATASET.num_class = NUM_FG + 1
    cfg.TRAIN.task_input_size = (80, 80)
    if TASK_EVAL:
        cfg.TRAIN.task_input_size_eval = (TASK_EVAL, TASK_EVAL)
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.MODEL.gaussian_radius = 45
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.MODEL.rev_deform_interp = "nearest"
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.optim = "adam"

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc, dtype=jnp.bfloat16)
    tx = create_optimizer(cfg)

    data_key = jax.random.PRNGKey(7)
    sample = make_batch_device(jax.random.fold_in(data_key, 0), BATCH, CANVAS, NUM_FG)
    state = init_state(module, tx, jax.random.PRNGKey(0), jax.device_get(sample))

    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(save_dir), "carry")
    restored = ocp.PyTreeCheckpointer().restore(
        path, item=jax.device_get({"state": state, "step": 0})
    )
    state = jax.device_put(restored["state"])
    step0 = int(restored["step"])
    print(f"attributing residual for checkpoint at step {step0}", flush=True)

    @jax.jit
    def eval_one(state, i):
        b = make_batch_device(jax.random.fold_in(data_key, -(1 + i)), BATCH, CANVAS, NUM_FG)
        mask = b["seg_label"] > 0.5
        cls = b["cls_label"][:, None, None]
        gt_full = jnp.where(mask, cls, BG).astype(jnp.float32)  # class-id label map
        out = module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b["img_data"], b["focus_point"],
            y=gt_full, y_sampled_reverse=True,
            argmax_labels=True, method=DeformSegmentation.infer,
        )

        def iou(hit, ref):
            inter = jnp.sum(hit & ref, axis=(1, 2)).astype(jnp.float32)
            union = jnp.sum(hit | ref, axis=(1, 2)).astype(jnp.float32)
            return jnp.mean(inter / jnp.maximum(union, 1.0))

        pred = out["pred_label"].astype(jnp.int32)          # full-res serving argmax
        y_rev = out["y_sampled_reverse"].astype(jnp.int32)  # GT round trip
        y_s = out["y_sampled"].astype(jnp.int32)            # warped-domain GT ids
        pred_task = jnp.argmax(out["pred"], axis=-1).astype(jnp.int32)
        return (
            iou(pred == cls, mask),           # fullres model fg IoU
            iou(y_rev == cls, mask),          # intrinsic warp ceiling
            iou(pred_task == cls, y_s == cls) # warped-domain model fg IoU
        )

    rows = np.array([[float(v) for v in eval_one(state, jnp.int32(i))]
                     for i in range(N_BATCHES)])
    res = {
        "step": step0,
        "task_eval": TASK_EVAL or 80,
        "eval_batches": N_BATCHES,
        "samples": N_BATCHES * BATCH,
        "fullres_model_iou_mean": float(rows[:, 0].mean()),
        "fullres_model_iou_std": float(rows[:, 0].std()),
        "intrinsic_ceiling_mean": float(rows[:, 1].mean()),
        "intrinsic_ceiling_std": float(rows[:, 1].std()),
        "warped_model_iou_mean": float(rows[:, 2].mean()),
        "warped_model_iou_std": float(rows[:, 2].std()),
        "warp_floor": float(1.0 - rows[:, 1].mean()),
        "model_residual": float(rows[:, 1].mean() - rows[:, 0].mean()),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
