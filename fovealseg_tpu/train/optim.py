"""4-group optimizer + staged LR schedule as one optax transform.

The reference builds four torch Adam optimizers (encoder/decoder/saliency/
compress, train_deform_semantic.py:260-290) whose LRs are overwritten every
iteration by ``adjust_learning_rate`` (302-350): with the default
``deform_pretrain_bol=True`` every group runs at
``lr_mult * 0.1 * 0.1^(epoch // TRAIN.deform_pretrain)``; the
fix_deform / fix_seg windows zero out the "zoom" (saliency+compress) or
"class" (encoder+decoder) groups. Torch-Adam semantics: L2 weight decay is
added to the gradient *before* the moment updates.

Here that whole state machine is one ``optax.multi_transform`` over the
4-subtree param pytree, with the schedule a pure function of the step count.
Window gating is implemented as lr=0 (documented deviation: Adam moments
still accumulate during a window, whereas the reference skips ``.step()``;
identical on the default config where the windows are disabled).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax


class LRSchedules(NamedTuple):
    lr_class: callable  # step -> lr factor for encoder/decoder ("zoom=False")
    lr_zoom: callable  # step -> lr factor for saliency/compress ("zoom=True")


def make_stage_schedules(cfg) -> LRSchedules:
    """Decade-decay staged schedule (train_deform_semantic.py:318-345)."""
    base_lr = 0.1
    n_pre = cfg.TRAIN.deform_pretrain
    epoch_iters = cfg.TRAIN.epoch_iters
    scale_by_iter = cfg.TRAIN.scale_by_iter
    pretrain_bol = cfg.TRAIN.deform_pretrain_bol
    fix_deform = (
        cfg.TRAIN.fix_deform_aft_pretrain,
        cfg.TRAIN.fix_deform_start_epoch,
        cfg.TRAIN.fix_deform_end_epoch,
    )
    fix_seg = (
        cfg.TRAIN.opt_deform_LabelEdge,
        cfg.TRAIN.fix_seg_start_epoch,
        cfg.TRAIN.fix_seg_end_epoch,
    )

    def _idx_epoch_n(step):
        # the driver calls train() with 1-based epochs (main loop at
        # train_deform_semantic.py:476-482); cur_iter = i + (epoch-1)*iters.
        # With scale_by_iter the reference decays per-iteration but also
        # scales N_pretraining by epoch_iters (train_deform_semantic.py:321-323).
        epoch = step // epoch_iters + 1
        if scale_by_iter:
            return step, epoch, n_pre * epoch_iters
        return epoch, epoch, n_pre

    def lr_class(step):
        idx, epoch, n = _idx_epoch_n(step)
        if pretrain_bol:
            lr = base_lr * jnp.power(0.1, idx // n)
        else:
            shifted = jnp.where(idx >= n, (idx - n) // n, idx // n)
            lr = base_lr * jnp.power(0.1, shifted)
        on, s, e = fix_seg
        if on:
            lr = jnp.where((epoch >= s) & (epoch <= e), 0.0, lr)
        return lr

    def lr_zoom(step):
        idx, epoch, n = _idx_epoch_n(step)
        lr = base_lr * jnp.power(0.1, idx // n)
        on, s, e = fix_deform
        if on:
            lr = jnp.where((epoch >= s) & (epoch <= e), 0.0, lr)
        return lr

    return LRSchedules(lr_class, lr_zoom)


def _torch_adam(lr_fn, lr_mult: float, weight_decay: float, beta1: float):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda step: -lr_mult * lr_fn(step)),
    )


def _torch_sgd(lr_fn, lr_mult: float, weight_decay: float, momentum: float):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum),
        optax.scale_by_schedule(lambda step: -lr_mult * lr_fn(step)),
    )


def create_optimizer(cfg) -> optax.GradientTransformation:
    """Four param groups keyed by the DeformSegmentation subtree names."""
    sched = make_stage_schedules(cfg)
    wd = cfg.TRAIN.weight_decay
    beta1 = cfg.TRAIN.beta1
    mk = _torch_adam if cfg.TRAIN.optim.lower() == "adam" else _torch_sgd
    transforms = {
        "encoder": mk(sched.lr_class, cfg.TRAIN.lr_mult_encoder, wd, beta1),
        "decoder": mk(sched.lr_class, cfg.TRAIN.lr_mult_decoder, wd, beta1),
        "saliency": mk(sched.lr_zoom, cfg.TRAIN.lr_mult_saliency, wd, beta1),
        "compress": mk(sched.lr_zoom, cfg.TRAIN.lr_mult_compress, wd, beta1),
    }

    def label_fn(params):
        mapping = {
            "encoder": "encoder",
            "decoder": "decoder",
            "localization": "saliency",
            "net_compress": "compress",
        }
        import jax

        return {k: jax.tree.map(lambda _: mapping[k], v) for k, v in params.items()}

    return optax.multi_transform(transforms, label_fn)


def edge_loss_scale_at(cfg, cur_iter: int, epoch: int) -> float:
    """Runtime edge-loss-scale schedule (train_deform_semantic.py:82-88,
    294-300): stage window override, else poly decay of
    TRAIN.fixed_edge_loss_scale (when > 0), else the static scale."""
    if (
        cfg.TRAIN.stage_adjust_edge_loss != 1.0
        and cfg.TRAIN.adjust_edge_loss_start_epoch <= epoch <= cfg.TRAIN.adjust_edge_loss_end_epoch
    ):
        return cfg.TRAIN.stage_adjust_edge_loss
    if cfg.TRAIN.fixed_edge_loss_scale > 0.0:
        scale = (1.0 - float(cur_iter) / max(cfg.TRAIN.max_iters, 1)) ** cfg.TRAIN.edge_loss_pow
        return max(cfg.TRAIN.fixed_edge_loss_scale * scale, cfg.TRAIN.edge_loss_scale_min)
    if (
        cfg.TRAIN.stage_adjust_edge_loss != 1.0
        and epoch > cfg.TRAIN.adjust_edge_loss_end_epoch
    ):
        # the reference's in-window mutation of cfg.TRAIN.edge_loss_scale is
        # sticky: epochs after the window keep the stage value unless the
        # fixed_edge_loss_scale poly branch overwrites it each iteration
        # (train_deform_semantic.py:86-89)
        return cfg.TRAIN.stage_adjust_edge_loss
    return cfg.TRAIN.edge_loss_scale


def poly_running_lrs(cfg, cur_iter: int, lr_scale: float = 1.0) -> dict:
    """The running_lr_* values the reference logs (train_deform_semantic.py
    303-317) — poly decay of the configured base LRs; feeds only the history
    CSV (lines 143,151), never the optimizers.

    ``TRAIN.fov_scale_lr`` (defaults.py:115-118): when non-empty, the decayed
    scale is multiplied by ``lr_scale ** TRAIN.fov_scale_pow`` (a
    patch-size-derived factor); ``TRAIN.fov_scale_seg_only`` exempts the
    foveater's logged LR. The shipped reference driver only ever calls this
    with lr_scale=1 (its single call site, train_deform_semantic.py:85,
    passes no scale), so the default is observationally a no-op there too.
    """
    scale = (1.0 - float(cur_iter) / max(cfg.TRAIN.max_iters, 1)) ** cfg.TRAIN.lr_pow
    if cfg.TRAIN.fov_scale_lr != "":
        scale *= lr_scale ** cfg.TRAIN.fov_scale_pow
    fov_scale = scale
    if cfg.TRAIN.fov_scale_seg_only and cfg.TRAIN.fov_scale_lr != "":
        fov_scale = scale / (lr_scale ** cfg.TRAIN.fov_scale_pow)
    return {
        "running_lr_encoder": cfg.TRAIN.lr_encoder * scale,
        "running_lr_decoder": cfg.TRAIN.lr_decoder * scale,
        "running_lr_foveater": cfg.TRAIN.lr_foveater * fov_scale,
    }
