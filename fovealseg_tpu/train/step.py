"""Jitted train/eval steps: forward + losses + grads (+ cross-replica psum).

Loss assembly mirrors the default-config training branch of
``DeformSegmentationModule.forward`` (/root/reference/models/models.py:
866-1094): label warp via grid_y, ground truth ``y*cls + (1-y)*bg``,
Dice + Focal(gamma=5) + joint edge loss, and the warped-domain accuracy
family. Everything is one XLA graph per step; under data parallelism the
same function runs inside ``shard_map`` with gradient/metric ``pmean`` over
the data axis (the TPU-native replacement for DDP's NCCL allreduce).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from fovealseg_tpu.core import losses as L
from fovealseg_tpu.core import metrics as M
from fovealseg_tpu.core.interpolate import resize_area, resize_bilinear, resize_nearest
from fovealseg_tpu.core.warp import grid_sample


@dataclasses.dataclass
class TrainState:
    """Minimal train state (params + BN stats + opt state + step)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.batch_stats, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss/schedule knobs extracted from the cfg tree."""

    num_class: int = 51
    edge_loss_scale: float = 100.0
    edge_norm: bool = True  # TRAIN.opt_deform_LabelEdge_norm
    deform_joint_loss: bool = True
    focal_gamma: float = 5.0
    # non-default edge-target modes (PIL-style chain, core/edges.py)
    entropy_reg_weight: float = 0.0  # TRAIN.entropy_regularisation(_weight)
    edge_target_softmax: bool = False  # TRAIN.opt_deform_LabelEdge_softmax
    edge_zero_bound: int = 0  # TRAIN.deform_zero_bound(_factor)
    edge_blur_radius: float = 1.0  # MODEL.gt_grad_gaussian_blur_r
    saliency_hw: tuple = (80, 80)
    uniform_bi: bool = False  # MODEL.uniform_sample == 'BI': label downsample
    # bypasses the warp (plain bilinear + .long(), models/models.py:875-878)

    @classmethod
    def from_cfg(cls, cfg) -> "LossConfig":
        return cls(
            num_class=cfg.DATASET.num_class,
            edge_loss_scale=cfg.TRAIN.edge_loss_scale,
            edge_norm=cfg.TRAIN.opt_deform_LabelEdge_norm,
            deform_joint_loss=cfg.TRAIN.deform_joint_loss,
            focal_gamma=5.0,  # hard-coded at models/models.py:1059
            entropy_reg_weight=(cfg.TRAIN.entropy_regularisation_weight
                                if cfg.TRAIN.entropy_regularisation else 0.0),
            edge_target_softmax=cfg.TRAIN.opt_deform_LabelEdge_softmax,
            edge_zero_bound=(cfg.TRAIN.deform_zero_bound_factor if cfg.TRAIN.deform_zero_bound else 0),
            edge_blur_radius=float(cfg.MODEL.gt_grad_gaussian_blur_r),
            saliency_hw=tuple(cfg.TRAIN.saliency_input_size),
            uniform_bi=cfg.MODEL.uniform_sample == "BI",
        )


def compute_losses(
    out: dict, batch: dict, lcfg: LossConfig, edge_scale=None
) -> tuple[jnp.ndarray, dict]:
    """out: DeformSegmentation forward dict; batch: img/seg_label/focus/cls.

    batch['seg_label']: [B, H, W] float binary mask; batch['cls_label']: [B]
    int; ``edge_scale`` optionally overrides TRAIN.edge_loss_scale as a traced
    scalar (the reference mutates cfg.TRAIN.edge_loss_scale per iteration —
    adjust_edge_loss_scale, train_deform_semantic.py:294-300);
    returns (total_loss, metrics dict).
    """
    y = batch["seg_label"].astype(jnp.float32)
    cls = batch["cls_label"].astype(jnp.int32).reshape(-1)
    xs = out["xs"]
    pred = out["pred"].astype(jnp.float32)
    bg = lcfg.num_class - 1

    gh, gw = xs.shape[1], xs.shape[2]
    if lcfg.edge_norm:
        # default path: area-downsampled label, globally min-max normalized
        # (models/models.py:725-730, 886-898)
        xs_target = resize_area(y[..., None], (gh, gw))
    else:
        # PIL-style FIND_EDGES target (models/models.py:777-800)
        from fovealseg_tpu.core.edges import edge_target_pil_style

        xs_target = edge_target_pil_style(
            y, lcfg.saliency_hw, (gh, gw), lcfg.edge_blur_radius,
            softmax=lcfg.edge_target_softmax, zero_bound=lcfg.edge_zero_bound,
        )
    if edge_scale is None:
        edge_scale = batch.get("edge_scale")
    scale = lcfg.edge_loss_scale if edge_scale is None else edge_scale
    # the NORM edge loss trains on the PRE-override predicted saliency (the
    # reference's xs_our clone, models/models.py:726, 886-891) so the
    # saliency nets keep learning under gt_gradient/uniform overrides; the
    # non-norm branch uses the post-override xs (models.py:896-897)
    xs_edge = out.get("xs_our", xs) if lcfg.edge_norm else xs
    e_loss = L.edge_loss(xs_edge, xs_target, scale, lcfg.edge_norm)

    if lcfg.uniform_bi:
        # uniform-BI baseline: plain bilinear label downsample + .long()
        # truncation instead of the warp (models/models.py:875-878)
        lh, lw = out["grid_y"].shape[1], out["grid_y"].shape[2]
        y_sampled = resize_bilinear(y[..., None], (lh, lw))[..., 0]
    else:
        # label warp: bilinear grid_sample then .long() truncation
        # (models/models.py:880, 966-971)
        y_sampled = grid_sample(y[..., None], out["grid_y"])[..., 0]
    label = y_sampled.astype(jnp.int32)
    gt = label * cls[:, None, None] + (1 - label) * bg

    if "pred_hr" in out:
        # MODEL.loss_at_high_res: seg loss on the inverse-warped full-res
        # prediction against the full-res label (models_instance.py:783-786);
        # the gt composition mirrors the warped-domain formula (the
        # reference's high-res branch predates its instance gt composition)
        pred_hr = out["pred_hr"].astype(jnp.float32)
        y_hr = y
        if y.shape[1:3] != pred_hr.shape[1:3]:
            # torch-parity nearest indexing (floor(i*in/out)) — the repo's
            # resize_nearest, not jax.image.resize's half-pixel-center nearest
            y_hr = resize_nearest(y[..., None], pred_hr.shape[1:3])[..., 0]
        label_hr = y_hr.astype(jnp.int32)
        gt_loss_pred, gt_loss_gt = pred_hr, label_hr * cls[:, None, None] + (1 - label_hr) * bg
    else:
        gt_loss_pred, gt_loss_gt = pred, gt

    focal = L.focal_loss(gt_loss_pred, gt_loss_gt, lcfg.focal_gamma)
    dice = L.dice_loss_multiclass(gt_loss_pred, gt_loss_gt)
    loss = dice + focal
    if lcfg.deform_joint_loss:
        loss = loss + e_loss
    if lcfg.entropy_reg_weight:
        # saliency entropy regularizer (TRAIN.entropy_regularisation; the
        # weight is applied to the NEGATIVE entropy so positive weights
        # push toward uniform saliency)
        p_flat = xs.reshape(xs.shape[0], -1)
        ent = -jnp.sum(p_flat * jnp.log(p_flat + 1e-12), axis=-1)
        loss = loss - lcfg.entropy_reg_weight * jnp.mean(ent)

    acc = M.pixel_acc(gt_loss_pred, gt_loss_gt, bg)
    edge_only = batch.get("edge_only")
    if edge_only is not None:
        # TRAIN.opt_deform_LabelEdge fix_seg window: the reference returns
        # (edge_loss, edge_acc, edge_loss) before the segmentation forward
        # (models/models.py:899-901) — the whole step trains on the edge
        # loss only, and the logged acc is the (degenerate) edge_acc:
        # pixel_acc of the channel-argmax (always 0, single channel) vs the
        # int-truncated target
        eo = jnp.asarray(edge_only, bool)
        loss = jnp.where(eo, e_loss, loss)
        tgt_acc = L.minmax_normalize(xs_target) if lcfg.edge_norm else xs_target
        edge_acc = jnp.mean((jnp.floor(tgt_acc) == 0.0).astype(jnp.float32))
        acc = jnp.where(eo, edge_acc, acc)

    mets = {
        "loss": loss,
        "dice_loss": dice,
        "focal_loss": focal,
        "edge_loss": e_loss,
        "acc": acc,
        "acc_bin_fg": M.fg_bin_pixel_acc(gt_loss_pred, gt_loss_gt, bg),
        "acc_cls_fbg": M.fbg_cls_pixel_acc(gt_loss_pred, gt_loss_gt, bg),
        "acc_bin_fbg": M.fbg_bin_pixel_acc(gt_loss_pred, gt_loss_gt, bg),
    }
    return loss, mets


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    lcfg: LossConfig,
    axis_name: Optional[str] = None,
    fix_bn: bool = False,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    When ``axis_name`` is set the step is meant to run inside
    shard_map/pmap over that axis: grads and metrics are ``pmean``-reduced
    (BN cross-replica stats are handled by the module's own axis_name).

    ``fix_bn`` (TRAIN.fix_bn): the reference trains with the module in eval
    mode — ``segmentation_module.train(not cfg.TRAIN.fix_bn)``
    (train_deform_semantic.py:69) — so BN uses (and never updates) running
    stats and dropout is inactive, while grads still flow.
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        y = batch["seg_label"] if module.config.gt_gradient else None
        pool_s = batch.get("pool_s")  # Recasens pretrain augmentation size
        if fix_bn:
            out = module.apply(
                variables, batch["img_data"], batch["focus_point"],
                train=False, y=y, pool_s=pool_s,
            )
            new_stats = batch_stats
        else:
            out, mutated = module.apply(
                variables,
                batch["img_data"],
                batch["focus_point"],
                train=True,
                y=y,
                pool_s=pool_s,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        loss, mets = compute_losses(out, batch, lcfg)
        return loss, (mets, new_stats)

    def train_step(state: TrainState, batch: dict, rng) -> tuple[TrainState, dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (mets, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            mets = jax.lax.pmean(mets, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, mets

    return train_step


def make_eval_step(module, lcfg: LossConfig, axis_name: Optional[str] = None):
    """Warped-domain eval step (evaluate_1epoch semantics, eval.py:372-451)."""

    def eval_step(params, batch_stats, batch) -> dict:
        variables = {"params": params, "batch_stats": batch_stats}
        y = batch["seg_label"] if module.config.gt_gradient else None
        out = module.apply(
            variables, batch["img_data"], batch["focus_point"], train=False, y=y
        )
        _, mets = compute_losses(out, batch, lcfg)
        if axis_name is not None:
            mets = jax.lax.pmean(mets, axis_name)
        return mets

    return eval_step


def init_state(module, tx, rng, sample_batch) -> TrainState:
    # jit the init: eager op-by-op init materializes every forward
    # intermediate concurrently under async dispatch — at the flagship
    # 640px shapes that can exhaust the 16G HBM (observed in cli/infer
    # before the same fix); one compiled program has proper buffer liveness
    variables = jax.jit(module.init)(
        {"params": rng, "dropout": rng},
        jnp.asarray(sample_batch["img_data"]),
        jnp.asarray(sample_batch["focus_point"]),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))
