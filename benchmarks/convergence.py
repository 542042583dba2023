"""On-chip convergence benchmark: does the PRODUCTION training system learn?

Trains the full flagship (HRNetV2-nodownsp FSNet, 640px canvas -> 80x80 task,
NUM_FG+1 classes, joint Dice+Focal+edge loss, production optimizer/defaults) on
*fresh* device-generated synthetic scenes every step — no data reuse, so the
curve measures generalization, not memorization — and evaluates full-res
foreground IoU (the reference's headline metric family, README.md:4) on a
held-out synthetic set through the REAL inference path (forward warp ->
segment -> argmax inverse warp to 640^2).

Everything is device-resident (data generated in-graph by
data/synthetic.py::make_batch_device), so the WAN TPU tunnel of this image
costs one scalar fetch per chunk instead of 78 MB/step.

Usage: python benchmarks/convergence.py [steps] (default 1500); env knobs:
TRAIN_BATCH, NUM_FG (fg classes, default 10; 50 = LVIS flagship shape),
LR_MULT_SCALE (seg-group LR multiplier scale, default 10 -- 3 was the
measured sweet spot for the 10-class demo), LR_MULT_SCALE_ZOOM (foveation
branch, default 1: 10x measured a collapse to all-background).
Prints per-chunk: step, mean train loss, held-out full-res fg IoU, pixel acc.

STAGED=1 drives the reference's published staged recipe (the state machine
at train_deform_semantic.py:82-123, 260-350 the README's 150-epoch LVIS
command exercises) through the production machinery, with a synthetic
"epoch" of TRAIN.epoch_iters=1000 steps:

  phase 1 (epochs 1..PRETRAIN_EPOCHS, default 5): saliency pretrain — the
    TRAIN.opt_deform_LabelEdge fix_seg window: the step loss is the edge
    loss alone (models/models.py:899-901 early return -> the traced
    batch['edge_only'] flag) and the encoder/decoder LR is gated to 0
    (adjust_learning_rate fix_seg branch -> train/optim.py lr_class).
  phase 2 (next FIX_DEFORM_EPOCHS epochs, default 10): fix_deform window —
    joint loss but saliency/compress LR gated to 0, so the segmentation
    nets learn on a frozen, edge-pretrained warp.
  phase 3: joint training, as the flat recipe.
  decade decay: DECAY_AT_STEP (default 67000 for a 100k run — the shipped
    config decays at epoch 100 of 150, train epoch_iters*deform_pretrain).
  edge annealing: EDGE_ANNEAL_MAX_ITERS (default steps when STAGED) enables
    the TRAIN.fixed_edge_loss_scale poly decay
    (adjust_edge_loss_scale, train_deform_semantic.py:294-300):
    scale = edge_loss_scale * (1 - iter/max_iters)^edge_loss_pow, traced
    per-step via batch['edge_scale'].
"""

import json
import os
import sys
import time

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
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

BATCH = int(os.environ.get("TRAIN_BATCH", "16"))
CANVAS = 640
CHUNK = 100
# 4 batches keeps the per-chunk eval cheap but noisy (51-class curves swing
# +-0.2 chunk to chunk); raise for legible curves, or use
# benchmarks/convergence_eval.py for a one-shot low-noise read of a carry.
EVAL_BATCHES = int(os.environ.get("EVAL_BATCHES", "4"))
# NUM_FG=50 is the LVIS-50 flagship shape; the default demo uses 10 classes
# so the curve is legible in a few thousand steps
NUM_FG = int(os.environ.get("NUM_FG", "10"))
BG = NUM_FG
# TASK: train/infer task grid size (TRAIN.task_input_size; saliency stays
# 80). Param shapes are task-size-independent, so a carry trained at 80 can
# be fine-tuned at 128 (the residual-attribution experiment's training-side
# follow-up); step cost scales ~(TASK/80)^2.
TASK = int(os.environ.get("TASK", "80"))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    cfg = get_default_cfg()
    cfg.DATASET.num_class = NUM_FG + 1
    cfg.TRAIN.task_input_size = (TASK, TASK)
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.MODEL.gaussian_radius = 45
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    # production run-config value (configs/deform.yaml:17): the argmax
    # serving path needs the nearest fill; the 'tri' default would
    # materialize [B,640,640,51] f32 score maps (OOM at b16)
    cfg.MODEL.rev_deform_interp = "nearest"
    cfg.DATASET.segm_downsampling_rate = 1
    # HIGHRES=1: the reference's MODEL.loss_at_high_res ablation
    # (models_instance.py:686-786) — the seg loss is computed on the
    # inverse-warped full-res prediction against the full-res label. The
    # residual-attribution work (PERF.md) names this the open training-time
    # lever for the ~0.03 saliency-localization residual. Costs a
    # [B,640,640,C] f32 score materialization + its backward per step.
    if bool(int(os.environ.get("HIGHRES", "0"))):
        cfg.MODEL.loss_at_high_res = True
        # keep the seg loss at 1/2 canvas res (segm_downsampling_rate=2 is
        # the reference's own default, config/defaults.py) unless overridden:
        # the full 640^2x51 f32 loss + backward does not fit 16G HBM at b16
        cfg.DATASET.segm_downsampling_rate = int(os.environ.get("SEGM_DS", "2"))
    cfg.TRAIN.optim = "adam"
    # Effective group LR in the reference is lr_mult * 0.1 (decade-staged;
    # adjust_learning_rate, train_deform_semantic.py:302-345) — the defaults
    # (encoder 1e-4 -> 1e-5 effective) suit a 111k-iteration LVIS run but
    # are glacial for a few-thousand-step demonstration. LR_MULT_SCALE
    # (default 10) scales all four group multipliers for the demo.
    # Scaling the saliency/compress multipliers too (10x) measured a
    # collapse to all-background — the foveation branch destabilizes and the
    # warped domain degenerates; seg-only scaling learns.
    s = float(os.environ.get("LR_MULT_SCALE", "3"))
    cfg.TRAIN.lr_mult_encoder *= s
    cfg.TRAIN.lr_mult_decoder *= s
    sz = float(os.environ.get("LR_MULT_SCALE_ZOOM", "1"))
    cfg.TRAIN.lr_mult_saliency *= sz
    cfg.TRAIN.lr_mult_compress *= sz
    cfg.TRAIN.deform_joint_loss = True

    # DECAY_AT_STEP: one-decade LR drop at an absolute step (0 = the config
    # defaults, which for a <495k-step run means flat LR). Routed through the
    # production staged schedule (train/optim.py): scale_by_iter decays
    # per-iteration with N = deform_pretrain * epoch_iters
    # (train_deform_semantic.py:321-323). Resume-safe: the schedule is a pure
    # function of the optimizer step count, and the pre-decay LR is identical
    # to the flat default, so a run resumed from a flat-LR carry continues
    # the exact same trajectory until the decay step.
    staged = bool(int(os.environ.get("STAGED", "0")))
    decay_at = int(os.environ.get("DECAY_AT_STEP", "67000" if staged else "0"))
    if decay_at:
        assert decay_at % 1000 == 0, "DECAY_AT_STEP must be a multiple of 1000"
        cfg.TRAIN.scale_by_iter = True
        cfg.TRAIN.epoch_iters = 1000
        cfg.TRAIN.deform_pretrain = decay_at // 1000

    # --- staged recipe (see module docstring) ---
    pretrain_epochs = int(os.environ.get("PRETRAIN_EPOCHS", "5")) if staged else 0
    fix_deform_epochs = int(os.environ.get("FIX_DEFORM_EPOCHS", "10")) if staged else 0
    edge_anneal_iters = int(os.environ.get("EDGE_ANNEAL_MAX_ITERS",
                                           str(steps) if staged else "0"))
    if staged:
        cfg.TRAIN.epoch_iters = 1000  # synthetic epoch for the window state machine
        if pretrain_epochs:
            cfg.TRAIN.opt_deform_LabelEdge = True
            cfg.TRAIN.fix_seg_start_epoch = 1
            cfg.TRAIN.fix_seg_end_epoch = pretrain_epochs
        if fix_deform_epochs:
            cfg.TRAIN.fix_deform_aft_pretrain = True
            cfg.TRAIN.fix_deform_start_epoch = pretrain_epochs + 1
            cfg.TRAIN.fix_deform_end_epoch = pretrain_epochs + fix_deform_epochs
    epoch_iters = cfg.TRAIN.epoch_iters
    edge_base = cfg.TRAIN.edge_loss_scale
    edge_pow = cfg.TRAIN.edge_loss_pow
    edge_min = cfg.TRAIN.edge_loss_scale_min

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc, dtype=jnp.bfloat16)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)
    step = make_train_step(module, tx, lcfg)

    data_key = jax.random.PRNGKey(7)
    drop_key = jax.random.key(1, impl=cfg.TPU.dropout_rng_impl)
    sample = make_batch_device(jax.random.fold_in(data_key, 0), BATCH, CANVAS, NUM_FG)
    state = init_state(module, tx, jax.random.PRNGKey(0), jax.device_get(sample))

    @jax.jit
    def train_chunk(state, start):
        def body(st, i):
            b = make_batch_device(jax.random.fold_in(data_key, 1 + start + i), BATCH, CANVAS, NUM_FG)
            step_abs = start + i
            if pretrain_epochs:
                # fix_seg window: edge-only loss, matching the lr_class=0 gate
                # the optimizer schedule applies over the same epochs
                epoch = step_abs // epoch_iters + 1
                b["edge_only"] = epoch <= pretrain_epochs
            if edge_anneal_iters:
                frac = jnp.maximum(1.0 - step_abs.astype(jnp.float32) / edge_anneal_iters, 0.0)
                b["edge_scale"] = jnp.maximum(edge_base * frac**edge_pow, edge_min)
            st, mets = step(st, b, jax.random.fold_in(drop_key, start + i))
            return st, mets["loss"]

        return jax.lax.scan(body, state, jnp.arange(CHUNK))

    @jax.jit
    def eval_one(state, i):
        # held-out stream: negative fold_in indices never collide with train
        b = make_batch_device(jax.random.fold_in(data_key, -(1 + i)), BATCH, CANVAS, NUM_FG)
        out = module.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            b["img_data"], b["focus_point"],
            argmax_labels=True, method=DeformSegmentation.infer,
        )
        pred = out["pred_label"].astype(jnp.int32)  # [B,H,W] full-res class ids
        mask = b["seg_label"] > 0.5
        cls = b["cls_label"][:, None, None]

        def iou(hit):
            inter = jnp.sum(hit & mask, axis=(1, 2)).astype(jnp.float32)
            union = jnp.sum(hit | mask, axis=(1, 2)).astype(jnp.float32)
            return jnp.mean(inter / jnp.maximum(union, 1.0))

        fg_iou = iou(pred == cls)       # class-correct instance IoU
        bin_iou = iou(pred != BG)       # localization quality, class-agnostic
        gt_full = jnp.where(mask, cls, BG)
        acc = jnp.mean((pred == gt_full).astype(jnp.float32))
        return fg_iou, bin_iou, acc

    def eval_heldout(state):
        rows = [[float(v) for v in eval_one(state, jnp.int32(i))]
                for i in range(EVAL_BATCHES)]
        return [float(np.mean(col)) for col in zip(*rows)]

    # SAVE_DIR: checkpoint the carry every SAVE_EVERY chunks and resume from
    # it — long convergence runs survive process restarts. The data/dropout
    # streams are keyed by absolute step (fold_in), so a resumed run follows
    # the exact trajectory of an uninterrupted one.
    save_dir = os.environ.get("SAVE_DIR", "")
    save_every = int(os.environ.get("SAVE_EVERY", "20"))
    start0 = 0
    if save_dir:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        path = os.path.join(os.path.abspath(save_dir), "carry")
        if os.path.isdir(path):
            restored = ckptr.restore(path, item=jax.device_get(
                {"state": state, "step": 0}))
            state = jax.device_put(restored["state"])
            start0 = int(restored["step"])
            print(f"resumed at step {start0} from {path}", flush=True)

    history = []
    t_start = time.time()
    for start in range(start0, steps, CHUNK):
        state, losses = train_chunk(state, jnp.int32(start))
        fg_iou, bin_iou, acc = eval_heldout(state)
        row = {
            "step": start + CHUNK,
            "train_loss": float(jnp.mean(losses)),
            "heldout_fg_iou": fg_iou,
            "heldout_bin_iou": bin_iou,
            "heldout_pixel_acc": acc,
        }
        history.append(row)
        print(
            f"step {row['step']:5d}: loss {row['train_loss']:.4f}  "
            f"full-res fg IoU {fg_iou:.4f}  bin IoU {bin_iou:.4f}  "
            f"acc {acc:.4f}  ({time.time()-t_start:.0f}s)",
            flush=True,
        )
        if save_dir and ((start - start0) // CHUNK + 1) % save_every == 0:
            import shutil

            tmp = path + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            ckptr.save(tmp, jax.device_get({"state": state, "step": start + CHUNK}))
            shutil.rmtree(path, ignore_errors=True)
            os.replace(tmp, path)
    # start_step makes resumed runs explicit: history covers
    # (start_step, steps] only — splice earlier logs for the full curve
    print(json.dumps({"batch": BATCH, "steps": steps, "start_step": start0,
                      "staged": staged, "pretrain_epochs": pretrain_epochs,
                      "fix_deform_epochs": fix_deform_epochs,
                      "decay_at_step": decay_at,
                      "edge_anneal_max_iters": edge_anneal_iters,
                      "history": history}))


if __name__ == "__main__":
    main()
