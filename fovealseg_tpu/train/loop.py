"""Epoch-driver loop: train epochs + warped-domain eval + history/checkpoints.

Rebuild of the reference driver (/root/reference/train_deform_semantic.py:
354-594): per-epoch ``train()`` over ``epoch_iters`` batches, checkpoint +
``epoch_last`` copies, eval via ``eval_during_train_deform`` -> warped-domain
metrics (eval.py:372-451), history CSV with the reference's schema
(``history_epoch_last_{rank}.csv``, train_deform_semantic.py:210-235), and
TRAIN.skip_train_for_eval / start_epoch resume semantics. No disk round-trip
between train and eval (the reference reloads all 4 nets from disk each eval
epoch — eval.py:463-487 — which SPMD makes unnecessary).
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.train import checkpoint as ckpt
from fovealseg_tpu.train.optim import poly_running_lrs

_POOL_RNGS: dict = {}


def _py_rng(cfg):
    """Per-seed python Random for the pretrain pool-size draw (the reference
    uses the global ``random`` module, models/models.py:911-913)."""
    import random

    seed = int(cfg.TRAIN.seed)
    if seed not in _POOL_RNGS:
        _POOL_RNGS[seed] = random.Random(seed)
    return _POOL_RNGS[seed]

log = logging.getLogger("fovealseg")


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.n = 0

    def update(self, v, k: int = 1):
        self.sum += float(v) * k
        self.n += k

    def average(self) -> float:
        return self.sum / max(self.n, 1)


def write_history_csv(path: str, rows: list[dict]) -> None:
    """history_epoch_last_{rank}.csv schema parity
    (train_deform_semantic.py:213-231)."""
    if not rows:
        return
    fields = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def load_history_csv(path: str, max_epoch: float) -> list[dict]:
    """Reload prior history rows on resume (the reference re-reads the CSV
    and truncates to the resume epoch, train_deform_semantic.py:415-455) —
    without this, the post-resume 'w' rewrite would discard every
    pre-restart row exactly in the preemption case auto_resume exists for."""
    if not os.path.exists(path):
        return []
    rows: list[dict] = []
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            vals = {k: (float(v) if v not in ("", None) else "") for k, v in r.items()}
            if float(vals.get("epoch", 0.0)) <= max_epoch:
                rows.append(vals)
    return rows


def train_one_epoch(
    train_step: Callable,
    state,
    batches: Iterable[dict],
    epoch: int,
    cfg,
    rng,
    history_rows: Optional[list] = None,
) -> tuple[object, dict]:
    from fovealseg_tpu.train.optim import edge_loss_scale_at

    # Per-step metrics stay ON DEVICE during the loop: converting them each
    # iteration would block the host on the step and serialize dispatch with
    # the next batch's host->device copy (the reference host-syncs every
    # iter; here one device_get per disp interval + one at epoch end keeps
    # transfers and compute overlapped through data/loader.py::prefetch).
    keys = ("loss", "acc", "edge_loss")
    pending: list = []  # device-side metric dicts, materialized lazily
    done: dict[str, list[float]] = {k: [] for k in keys}

    def _materialize():
        for mets in jax.device_get(pending):
            for k in keys:
                done[k].append(float(mets[k]))
        pending.clear()

    tic = time.time()
    i = 0
    for batch in batches:
        rng, sub = jax.random.split(rng)
        cur_iter = i + (epoch - 1) * cfg.TRAIN.epoch_iters
        batch = dict(batch)
        batch["edge_scale"] = jnp.float32(edge_loss_scale_at(cfg, cur_iter, epoch))
        # staged edge-only window: the reference trains on the edge loss
        # alone while fix_seg_start<=epoch<=fix_seg_end under
        # opt_deform_LabelEdge (models/models.py:899-901)
        batch["edge_only"] = jnp.bool_(
            cfg.TRAIN.opt_deform_LabelEdge
            and cfg.TRAIN.fix_seg_start_epoch <= epoch <= cfg.TRAIN.fix_seg_end_epoch
        )
        # Recasens pretrain augmentation: when deform_pretrain_bol is False
        # and the epoch is in the pretrain/smooth window, pool x_sampled to a
        # random (s, s) and upsample back (models/models.py:832-840, 911-917)
        pretrain_off = cfg.TRAIN.deform_pretrain_bol or (
            epoch >= cfg.TRAIN.deform_pretrain
            and (epoch < cfg.TRAIN.smooth_deform_2nd_start
                 or epoch > cfg.TRAIN.smooth_deform_2nd_end)
        )
        if cfg.TRAIN.deform_pretrain_bol:
            # pooling can NEVER activate this run (default config): omit the
            # key entirely so the step compiles without the stacked-pool
            # einsums + select (presence never changes mid-run → no recompile)
            pass
        elif pretrain_off:
            batch["pool_s"] = jnp.int32(-1)
        else:
            lo = min(cfg.TRAIN.saliency_input_size)
            batch["pool_s"] = jnp.int32(_py_rng(cfg).randint(lo // 3, lo))
        state, mets = train_step(state, batch, sub)
        pending.append(mets)
        if i % cfg.TRAIN.disp_iter == 0:
            _materialize()
            lrs = poly_running_lrs(cfg, cur_iter)
            log.info(
                "Epoch: [%d][%d/%d], Time: %.2f, lr_encoder: %.6f, "
                "Accuracy: %4.2f, Seg_Loss: %.6f, Edge_Loss: %.6f",
                epoch, i, cfg.TRAIN.epoch_iters, time.time() - tic,
                lrs["running_lr_encoder"], float(np.mean(done["acc"])) * 100,
                float(np.mean(done["loss"])), float(np.mean(done["edge_loss"])),
            )
        i += 1
        if i >= cfg.TRAIN.epoch_iters:
            break
    _materialize()
    if history_rows is not None:
        # identical rows to the reference's per-iter running averages
        # (train_deform_semantic.py:210-235), emitted after the epoch
        denom = np.arange(1, len(done["loss"]) + 1)
        running = {k: np.cumsum(done[k]) / denom for k in keys}
        for j in range(len(done["loss"])):
            history_rows.append(
                {
                    "epoch": epoch - 1 + (j + 1) / cfg.TRAIN.epoch_iters,
                    "train_loss": float(running["loss"][j]),
                    "train_acc": float(running["acc"][j]),
                    "train_edge_loss": float(running["edge_loss"][j]),
                }
            )
    summary = {k: float(np.mean(v)) if v else 0.0 for k, v in done.items()}
    return state, summary


def evaluate_1epoch(eval_step: Callable, state, batches: Iterable[dict],
                    drain_every: int = 16) -> dict:
    """Warped-domain eval (eval.py:372-451): mean loss/acc/edge + fg/bin
    accuracy family over the loader.

    Metric dicts stay ON DEVICE across the loop (same pending-metrics pattern
    as train_one_epoch): one device_get per ``drain_every`` batches instead of
    one host sync per batch — on the tunnel (~30 ms per host-visible call) a
    32-batch eval otherwise pays ~1 s of pure fixed cost and serializes
    dispatch. The periodic drain bounds in-flight work: an unbounded pending
    list would queue every batch's device input buffers before any sync,
    which at flagship 640px shapes on a long real-data loader can exhaust
    HBM/host RAM."""
    keys = ("loss", "acc", "edge_loss", "acc_bin_fg", "acc_cls_fbg", "acc_bin_fbg")
    meters = {k: AverageMeter() for k in keys}
    pending: list = []

    def _drain():
        for mets in jax.device_get(pending):
            for k in keys:
                meters[k].update(float(mets[k]))
        pending.clear()

    for batch in batches:
        pending.append(eval_step(state.params, state.batch_stats, batch))
        if len(pending) >= drain_every:
            _drain()
    _drain()
    return {k: m.average() for k, m in meters.items()}


def fit(
    cfg,
    state,
    train_step: Callable,
    eval_step: Callable,
    train_loader: Callable[[int], Iterable[dict]],
    val_loader: Callable[[], Iterable[dict]],
    rng=None,
    visual_fn: Optional[Callable] = None,
) -> object:
    """Full driver: epochs [start_epoch, num_epoch) with the reference's
    checkpoint/eval cadence and skip_train_for_eval support.

    ``visual_fn(state, epoch)`` (optional) emits the train visual-dump set;
    it is invoked on the reference's cadence (every-10-epochs ``epoch%10==1``
    when TRAIN.train_eval_visualise, models/models.py:973-976).
    ``cfg.TPU.profile_dir`` (rebuild-specific) captures a ``jax.profiler``
    device trace of the first training epoch (SURVEY.md §5 tracing)."""
    from fovealseg_tpu.utils.observe import SummaryWriter

    if rng is None:
        impl = getattr(cfg.TPU, "dropout_rng_impl", "threefry") or "threefry"
        rng = jax.random.key(cfg.TRAIN.seed, impl=impl)
    ckpt_dir = cfg.DIR
    os.makedirs(ckpt_dir, exist_ok=True)
    # resume: preload prior rows so the end-of-epoch 'w' rewrite extends the
    # curves instead of truncating them (train_deform_semantic.py:415-455)
    history: list[dict] = load_history_csv(
        os.path.join(ckpt_dir, "history_epoch_last_0.csv"), cfg.TRAIN.start_epoch
    ) if cfg.TRAIN.start_epoch > 0 else []
    eval_history: list[dict] = load_history_csv(
        os.path.join(ckpt_dir, "eval_history.csv"), cfg.TRAIN.start_epoch
    ) if cfg.TRAIN.start_epoch > 0 else []
    # TB scalar names mirror the reference writer (train_deform_semantic.py:
    # 403, 521-559)
    writer = SummaryWriter(os.path.join(ckpt_dir, "tensorboard"))
    profile_dir = getattr(cfg.TPU, "profile_dir", "")
    profiled = False
    saver = ckpt.AsyncSaver() if getattr(cfg.TPU, "async_checkpoint", True) else None

    for epoch0 in range(cfg.TRAIN.start_epoch, cfg.TRAIN.num_epoch):
        epoch = epoch0 + 1
        if not cfg.TRAIN.skip_train_for_eval:
            rng, sub = jax.random.split(rng)
            if profile_dir and not profiled:
                profiled = True
                with jax.profiler.trace(profile_dir):
                    state, summary = train_one_epoch(
                        train_step, state, train_loader(epoch), epoch, cfg, sub, history
                    )
                log.info("jax.profiler trace written to %s", profile_dir)
            else:
                state, summary = train_one_epoch(
                    train_step, state, train_loader(epoch), epoch, cfg, sub, history
                )
            if visual_fn is not None and cfg.TRAIN.train_eval_visualise and epoch % 10 == 1:
                visual_fn(state, epoch)
            log.info("epoch %d train: %s", epoch, json.dumps(summary))
            writer.add_scalar("Loss/train", summary["loss"], epoch)
            writer.add_scalar("Acc/train", summary["acc"], epoch)
            writer.add_scalar("edge_loss/train", summary["edge_loss"], epoch)
            if cfg.TRAIN.save_checkpoint and (
                epoch % cfg.TRAIN.checkpoint_per_epoch == 0 or epoch == cfg.TRAIN.num_epoch
            ):
                # async path: state goes to orbax device-resident (it
                # snapshots before returning, then writes in background —
                # overlapping the disk serialization with the next epoch);
                # sync path keeps the host-gather parity behavior
                save_state = state if saver is not None else jax.device_get(state)
                ckpt.save_checkpoint(ckpt_dir, epoch, save_state, saver=saver)
                if cfg.TPU.torch_ckpt_mirror:
                    # reference-format .pth mirror on the same cadence, so
                    # reference-side tooling can consume checkpoints live.
                    # Under the async saver the state is device-resident
                    # (possibly GSPMD-sharded): gather it ONCE here so the
                    # mirror's per-leaf np conversions don't each do a
                    # serialized device->host fetch on the training thread
                    # (the ~100s tunnel stall AsyncSaver removed).
                    host = (jax.device_get(save_state)
                            if saver is not None else save_state)
                    ckpt.save_torch_checkpoint(
                        ckpt_dir, epoch, host.params, host.batch_stats
                    )
            elif cfg.TRAIN.save_checkpoint:
                # off-cadence: refresh only epoch_last (reference keeps only
                # the *_last copies between cadence epochs,
                # train_deform_semantic.py:166-208)
                save_state = state if saver is not None else jax.device_get(state)
                ckpt.save_checkpoint(ckpt_dir, epoch, save_state, only_last=True,
                                     saver=saver)
                if cfg.TPU.torch_ckpt_mirror:
                    host = (jax.device_get(save_state)
                            if saver is not None else save_state)
                    ckpt.save_torch_checkpoint(
                        ckpt_dir, "last", host.params, host.batch_stats,
                        also_last=False,
                    )
        if epoch % cfg.TRAIN.eval_per_epoch == 0 or cfg.TRAIN.skip_train_for_eval:
            mets = evaluate_1epoch(eval_step, state, val_loader())
            log.info("epoch %d eval: %s", epoch, json.dumps(mets))
            eval_history.append({"epoch": epoch, **mets})
            for k, v in mets.items():
                writer.add_scalar(f"{k}/val", v, epoch)
        write_history_csv(os.path.join(ckpt_dir, "history_epoch_last_0.csv"), history)
        write_history_csv(os.path.join(ckpt_dir, "eval_history.csv"), eval_history)
        if cfg.TRAIN.skip_train_for_eval:
            break
    writer.close()
    if saver is not None:
        saver.close()  # drain the in-flight background write
    return state
