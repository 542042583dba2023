"""Low-noise held-out evaluation of a convergence.py checkpoint.

convergence.py logs a 4-batch held-out eval per chunk — cheap but noisy
(the 51-class curve swings +-0.2 IoU chunk to chunk). This loads the orbax
``carry`` checkpoint a convergence run saves (SAVE_DIR env) and evaluates
N_BATCHES fresh held-out batches through the REAL serving path (forward
warp -> segment -> argmax inverse warp to the full canvas), reporting
mean +- std full-res fg IoU / bin IoU / pixel acc.

Usage: SAVE_DIR=/tmp/conv51_ckpt NUM_FG=50 EVAL_BATCHES=32 \
           python benchmarks/convergence_eval.py
Knobs mirror convergence.py (TRAIN_BATCH, NUM_FG). QUANTIZE=int8 runs the
same eval through the opt-in W8A8 serving path (TPU.quantize semantics,
models/layers.py) — the task-accuracy check for the quantization feature
on real trained weights.
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
QUANTIZE = os.environ.get("QUANTIZE", "")  # "int8" -> W8A8 serving path


def main():
    save_dir = os.environ["SAVE_DIR"]
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
    # TASK_EVAL=128: evaluate with the inference grid rebuilt at NxN (the
    # reference's input_size_net_infer surface / TRAIN.task_input_size_eval)
    te = int(os.environ.get("TASK_EVAL", "0"))
    if te:
        cfg.TRAIN.task_input_size_eval = (te, te)

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
    print(f"evaluating checkpoint at step {step0}", flush=True)

    quant = None
    if QUANTIZE == "int8":
        # the cli/infer.py W8A8 serving configuration: trace-time flag on,
        # weight quantization hoisted out of the loop, passed as an argument
        # (a 130M-param closure constant would blow the tunnel compile limit)
        from fovealseg_tpu.models.layers import (
            quantize_params,
            quantized_kernel_paths,
            set_quantization,
        )

        set_quantization(True)
        paths = quantized_kernel_paths(
            module, {"params": state.params, "batch_stats": state.batch_stats},
            sample["img_data"], sample["focus_point"],
            argmax_labels=True, method=DeformSegmentation.infer,
        )
        quant = quantize_params(state.params, paths)

    @jax.jit
    def eval_one(state, quant, i):
        # the same held-out stream convergence.py uses (negative fold_in),
        # extended past its 4 batches
        b = make_batch_device(jax.random.fold_in(data_key, -(1 + i)), BATCH, CANVAS, NUM_FG)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = module.apply(
            variables, b["img_data"], b["focus_point"],
            argmax_labels=True, method=DeformSegmentation.infer,
        )
        pred = out["pred_label"].astype(jnp.int32)
        mask = b["seg_label"] > 0.5
        cls = b["cls_label"][:, None, None]

        def iou(hit):
            inter = jnp.sum(hit & mask, axis=(1, 2)).astype(jnp.float32)
            union = jnp.sum(hit | mask, axis=(1, 2)).astype(jnp.float32)
            return jnp.mean(inter / jnp.maximum(union, 1.0))

        gt_full = jnp.where(mask, cls, BG)
        return (iou(pred == cls), iou(pred != BG),
                jnp.mean((pred == gt_full).astype(jnp.float32)))

    rows = np.array([[float(v) for v in eval_one(state, quant, jnp.int32(i))]
                     for i in range(N_BATCHES)])
    res = {
        "step": step0,
        "quantize": QUANTIZE or "bf16",
        "eval_batches": N_BATCHES,
        "samples": N_BATCHES * BATCH,
        "fg_iou_mean": float(rows[:, 0].mean()),
        "fg_iou_std": float(rows[:, 0].std()),
        "bin_iou_mean": float(rows[:, 1].mean()),
        "bin_iou_std": float(rows[:, 1].std()),
        "pixel_acc_mean": float(rows[:, 2].mean()),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
