"""DeformSegmentation — the foveation pipeline as one jittable flax module.

Rebuild of ``DeformSegmentationModule``
(/root/reference/models/models.py:476-1094) with the whole default-config
forward as a single XLA graph (the reference's per-sample Python/PIL work on
the default LVIS path is dead compute — the joint edge loss actually compares
the saliency map against an area-downsampled label, models/models.py:886-898 —
so nothing data-dependent remains):

  gaze distance map -> 5ch saliency input -> FovSim + Compress -> softmax
  saliency -> replication pad -> Gaussian grid solver -> forward warp of
  image (+ label grid) -> encoder/decoder -> 51ch logits.

Sub-networks are separate param subtrees ({saliency, compress, encoder,
decoder}) mirroring the reference's 4-network / 4-optimizer / 4-checkpoint
split (train_deform_semantic.py:166-208, 260-290).

Losses/metrics live in ``fovealseg_tpu.train.step`` (pure functions over the
returned tensors); the full-res inverse-warp inference path is ``infer()``
(models/models_instance.py:839-949).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fovealseg_tpu.core.gaze import focus_distance_map
from fovealseg_tpu.core.grid import GridSolver, inverse_grid, inverse_grid_index, pad_saliency
from fovealseg_tpu.core.interpolate import resize_bilinear, resize_nearest
from fovealseg_tpu.core.unwarp import (
    fill_values_splat,
    jfa_rounds_from_grid,
    unwarp_argmax_scatter,
    unwarp_labels_fast,
    unwarp_prediction,
    unwarp_prediction_fast,
)
from fovealseg_tpu.core.warp import grid_sample


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    """Static geometry/config snapshot (immutable per-step view of the cfg
    singleton the reference mutates at runtime — SURVEY.md §5)."""

    task_hw: tuple[int, int] = (80, 80)
    task_hw_infer: tuple[int, int] = (80, 80)  # TRAIN.task_input_size_eval or task size
    saliency_hw: tuple[int, int] = (80, 80)
    num_class: int = 51
    segm_downsampling_rate: int = 1
    gaussian_radius: int = 45
    gaussian_ap: float = 0.0
    saliency_output_size_short: int = 0
    pad_mode: str = "replication"  # TRAIN.def_saliency_pad_mode
    saliency_net: str = "fovsimple"
    arch_encoder: str = "hrnetv2_nodownsp"
    arch_decoder: str = "c1"
    fc_dim: int = 960
    rev_deform_interp: str = "nearest"
    uniform_sample: str = ""
    f_xlr_low_scale: int = 0  # VAL.F_Xlr_low_scale: downscale the saliency
    # input for efficient inference (eval.py F_Xlr path); 0 = off
    jfa_iters: int = 0  # TPU.jfa_iters: fixed JFA chain length; 0 = derive
    # the round count from the grid geometry at runtime (jfa_rounds_from_grid)
    scoremap_gather: str = "xla"  # TPU.scoremap_gather: score-map gather
    # impl — "xla" flat gather or "windowed" Pallas lane-gather (bit-exact,
    # in-graph fallback; ops/pallas_gather.py). Serving argmax is unaffected.
    scoremap_gather_bf16: bool = False  # TPU.scoremap_gather_bf16: the
    # score-map inverse warp gathers bf16 rows (-12.5% on the gather stage;
    # scores round to bf16). Default off = bit-exact vs unwarp_prediction.
    # MODEL.gt_gradient family (models/models.py:735-773): detach the
    # saliency; with fix_gt_gradient replace it by the label-edge sampler
    gt_gradient: bool = False
    fix_gt_gradient: bool = False
    ignore_gt_labels: tuple = ()  # MODEL.ignore_gt_labels -> mapped to 0
    gt_grad_blur_r: float = 1.0  # MODEL.gt_grad_gaussian_blur_r
    deform_zero_bound: int = 0  # TRAIN.deform_zero_bound(_factor)
    # MODEL.loss_at_high_res (models_instance.py:686-786): inverse-warp the
    # training prediction to full resolution and compute the seg loss there
    loss_at_high_res: bool = False

    @classmethod
    def from_cfg(cls, cfg) -> "DeformConfig":
        task = tuple(cfg.TRAIN.task_input_size)
        task_eval = tuple(cfg.TRAIN.task_input_size_eval)
        return cls(
            task_hw=task,
            task_hw_infer=task_eval if len(task_eval) else task,
            saliency_hw=tuple(cfg.TRAIN.saliency_input_size),
            num_class=cfg.DATASET.num_class,
            segm_downsampling_rate=cfg.DATASET.segm_downsampling_rate,
            gaussian_radius=cfg.MODEL.gaussian_radius,
            gaussian_ap=cfg.MODEL.gaussian_ap,
            saliency_output_size_short=cfg.MODEL.saliency_output_size_short,
            pad_mode=cfg.TRAIN.def_saliency_pad_mode,
            saliency_net=cfg.MODEL.saliency_net,
            arch_encoder=cfg.MODEL.arch_encoder,
            arch_decoder=cfg.MODEL.arch_decoder,
            fc_dim=cfg.MODEL.fc_dim,
            rev_deform_interp=cfg.MODEL.rev_deform_interp,
            uniform_sample=cfg.MODEL.uniform_sample,
            f_xlr_low_scale=cfg.VAL.F_Xlr_low_scale,
            jfa_iters=cfg.TPU.jfa_iters,
            scoremap_gather=cfg.TPU.scoremap_gather,
            scoremap_gather_bf16=cfg.TPU.scoremap_gather_bf16,
            gt_gradient=cfg.MODEL.gt_gradient,
            fix_gt_gradient=cfg.MODEL.fix_gt_gradient,
            ignore_gt_labels=tuple(cfg.MODEL.ignore_gt_labels),
            gt_grad_blur_r=float(cfg.MODEL.gt_grad_gaussian_blur_r),
            deform_zero_bound=(cfg.TRAIN.deform_zero_bound_factor
                               if cfg.TRAIN.deform_zero_bound else 0),
            loss_at_high_res=cfg.MODEL.loss_at_high_res,
        )

    def solver(self) -> GridSolver:
        sal_h, sal_w = self.saliency_hw
        grid_h = self.saliency_output_size_short or sal_h
        grid_w = sal_w // (sal_h // grid_h)
        pad_x = self.gaussian_radius
        ap = self.gaussian_ap if self.gaussian_ap != 0.0 else sal_w // sal_h
        return GridSolver(grid_h, grid_w, pad_x, int(ap * pad_x), float(self.gaussian_radius))


@functools.lru_cache(maxsize=8)
def _pretrain_pool_operators(task_hw, saliency_hw):
    """Stacked pool->upsample operators for the Recasens pretrain
    augmentation (models/models.py:911-917): for each s in
    [min_sal//3, min_sal], ``A_s = U_s @ P_s`` where P_s is the
    AdaptiveAvgPool2d(T->s) bin matrix and U_s the bilinear (s->T)
    align_corners=False resize. Returns (s_min, [S, th, th], [S, tw, tw])
    numpy stacks — indexing the stack with a TRACED s keeps the graph
    fixed-shape (the torch original's dynamic pool size would force one
    recompile per drawn s on TPU)."""
    import numpy as np

    from fovealseg_tpu.core.interpolate import (
        _area_resize_matrix,
        _linear_resize_matrix,
    )

    s_min = max(min(saliency_hw) // 3, 1)
    s_max = min(saliency_hw)
    rows, cols = [], []
    for s in range(s_min, s_max + 1):
        rows.append(_linear_resize_matrix(s, task_hw[0]) @ _area_resize_matrix(task_hw[0], s))
        cols.append(_linear_resize_matrix(s, task_hw[1]) @ _area_resize_matrix(task_hw[1], s))
    return s_min, np.stack(rows), np.stack(cols)


class DeformSegmentation(nn.Module):
    """Foveation + segmentation forward. Sub-nets built via models.builder."""

    config: DeformConfig
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    # Latency-oriented spatial partitioning (beyond-reference scaling axis):
    # a jax.sharding.NamedSharding like NamedSharding(mesh, P(None, 'spatial'))
    # constrains the warped task image's ROWS over the mesh, so XLA's SPMD
    # partitioner runs the encoder/decoder convs spatially partitioned with
    # automatic halo exchanges over ICI (the single-image latency analogue of
    # data parallelism — there is no batch to split at b1). The inverse-warp
    # stage is re-replicated first (scatter/Pallas JFA stay single-shard).
    # Only for GSPMD jit paths; must be None under shard_map (the dp path).
    spatial_sharding: Any = None

    def setup(self):
        from fovealseg_tpu.models.builder import (
            build_decoder,
            build_encoder,
            build_net_compress,
            build_net_saliency,
        )

        c = self.config
        self.localization = build_net_saliency(c.saliency_net, self.axis_name, self.dtype)
        self.net_compress = build_net_compress(c.saliency_net, self.dtype)
        self.encoder = build_encoder(c.arch_encoder, c.fc_dim, self.axis_name, self.dtype)
        self.decoder = build_decoder(c.arch_decoder, c.fc_dim, c.num_class, self.axis_name, self.dtype)

    def saliency(self, x, focus_point, train: bool = False):
        """Image + gaze -> softmax saliency map [B, gh, gw, 1]
        (models/models.py:684-723)."""
        c = self.config
        solver = c.solver()
        sal_hw = c.saliency_hw
        if not train and c.f_xlr_low_scale > 1:
            # efficient-inference downscale (VAL.F_Xlr_low_scale)
            sal_hw = (sal_hw[0] // c.f_xlr_low_scale, sal_hw[1] // c.f_xlr_low_scale)
        x_low = resize_bilinear(x, sal_hw)
        fm = focus_distance_map(focus_point, *sal_hw).astype(x.dtype)
        x5 = jnp.concatenate([x_low, fm, fm], axis=-1)
        xs = self.localization(x5, train=train)
        xs = self.net_compress(xs, train=train)
        xs = resize_bilinear(xs, (solver.grid_h, solver.grid_w))
        b = xs.shape[0]
        flat = xs.reshape(b, -1).astype(jnp.float32)
        # NOTE: returns the PURE predicted saliency; the gt_gradient /
        # uniform_sample overrides are applied by _apply_overrides so the
        # pre-override map (the reference's xs_our clone, models.py:726)
        # stays available for the norm edge loss
        return jax.nn.softmax(flat, axis=-1).reshape(b, solver.grid_h, solver.grid_w, 1)

    def _apply_overrides(self, xs, y, xs_override):
        """The reference's saliency overrides, in its order (common to the
        train and inference forwards): the MODEL.gt_gradient edge-sampler
        replacement/detach (models/models.py:735-782) first, then the
        MODEL.uniform_sample flattening (models.py:816-818)."""
        c = self.config
        if xs_override is not None:
            xs = jax.lax.stop_gradient(xs_override)
        elif c.gt_gradient and y is not None:
            # MODEL.gt_gradient: the saliency is always detached
            # (xs.data = xsc.data, models/models.py:773); with
            # fix_gt_gradient it is replaced per sample by the label-edge
            # sampler chain (ignore labels -> normalize -> downsample ->
            # blur(gt_grad_gaussian_blur_r) -> FIND_EDGES -> upsample ->
            # zero-bound; models/models.py:741-772)
            if c.fix_gt_gradient and not (c.uniform_sample == "BI" and c.num_class == 2):
                # the reference skips the replacement for the uniform-BI
                # binary config (models/models.py:741)
                from fovealseg_tpu.core.edges import edge_target_pil_style

                yy = y.astype(jnp.float32)
                for k in c.ignore_gt_labels:
                    yy = jnp.where(yy == k, 0.0, yy)
                ov = edge_target_pil_style(
                    yy, c.saliency_hw, (xs.shape[1], xs.shape[2]),
                    c.gt_grad_blur_r, softmax=False,
                    zero_bound=c.deform_zero_bound,
                )  # [B, gh, gw, 1], matching the saliency rank
                xs = jax.lax.stop_gradient(ov.astype(xs.dtype))
            else:
                xs = jax.lax.stop_gradient(xs)
                if c.deform_zero_bound:
                    # the zero-bound border mask applies to the detached
                    # saliency too (models/models.py:766-771 masks xsc
                    # unconditionally inside the gt branch)
                    bound = c.deform_zero_bound
                    mask = jnp.zeros_like(xs)
                    mask = mask.at[:, bound:-bound, bound:-bound, :].set(1.0)
                    xs = xs * mask
        if c.uniform_sample != "":
            # uniform-downsample baseline (models.py:816-818)
            xs = jnp.full_like(xs, 1.0 / (xs.shape[1] * xs.shape[2]))
        return xs

    def _shard_rows(self, t):
        """Constrain task-image rows over the spatial mesh axis (no-op when
        spatial_sharding is unset)."""
        if self.spatial_sharding is None:
            return t
        return jax.lax.with_sharding_constraint(t, self.spatial_sharding)

    def _replicate(self, t):
        """Re-replicate before stages that must run single-shard (the
        inverse-warp scatter + Pallas JFA)."""
        if self.spatial_sharding is None:
            return t
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            t, NamedSharding(self.spatial_sharding.mesh, PartitionSpec())
        )

    def grids(self, xs, task_hw=None, label_hw=None):
        """Saliency -> (grid, grid_y) at task/label resolution.

        ``task_hw`` overrides the grid resolution (the reference upsamples the
        grid itself to input_size_net_infer at inference,
        models/models.py create_grid / models_instance.py:843-845)."""
        c = self.config
        solver = c.solver()
        xs_hm = pad_saliency(xs, solver.pad_x, solver.pad_y, c.pad_mode)
        if task_hw is None:
            task_hw = c.task_hw
        if label_hw is None:
            label_hw = (
                task_hw[0] // c.segm_downsampling_rate,
                task_hw[1] // c.segm_downsampling_rate,
            )
        return solver.create_grid(xs_hm, task_hw, label_hw)

    def __call__(self, x, focus_point, train: bool = False, xs_override=None, y=None,
                 pool_s=None):
        """Training/warped-domain forward.

        x: [B, H, W, 3] in [0, 1]; focus_point: [B, 2] (row, col) in [0, 1].
        ``pool_s`` (traced int32 scalar, or None) enables the Recasens
        pretrain augmentation: x_sampled is average-pooled to (s, s) and
        bilinearly upsampled back (models/models.py:911-917, active when
        TRAIN.deform_pretrain_bol is False during the pretrain window);
        s < 0 disables it at runtime without a recompile.
        ``xs_override`` replaces the predicted saliency with a fixed map
        (detached), the MODEL.gt_gradient "edge-based sampler" motivational
        mode (models/models.py:735-782); with ``config.gt_gradient`` set and
        ``y`` given the override is built in-graph from the label. Returns
        dict(xs, xs_our, grid, grid_y, x_sampled, pred) (+ ``pred_hr`` under
        MODEL.loss_at_high_res); ``xs_our`` is the pre-override predicted
        saliency (the reference's ``xs_our = xs.clone()``, models.py:726) —
        the norm edge loss trains the saliency nets through it even when the
        grid is driven by an override.
        """
        c = self.config
        xs_our = self.saliency(x, focus_point, train=train)
        xs = self._apply_overrides(xs_our, y, xs_override)
        grid, grid_y = self.grids(xs)
        if c.uniform_sample == "BI":
            # uniform-BI baseline bypasses the warp entirely: plain bilinear
            # downsample of the image (models.py:904-906)
            x_sampled = resize_bilinear(x.astype(self.dtype), c.task_hw)
        else:
            # warp in compute dtype: the gather is latency-bound per row, so
            # halving the row bytes (bf16) nearly halves the warp cost; the
            # result feeds the bf16 encoder anyway
            x_sampled = grid_sample(x.astype(self.dtype), grid)
        if pool_s is not None:
            # Recasens pretrain trick: pool to a random (s, s) and upsample
            # back (models/models.py:911-917) — fixed-shape via a stacked
            # per-s operator indexed by the traced s. Gated on pool_s alone,
            # not ``train``: the reference applies it in TRAIN.fix_bn
            # (eval-mode) training forwards too — models.py:905-920 checks
            # only segSize/epoch, not module.training
            s_min, ar_stack, ac_stack = _pretrain_pool_operators(
                (x_sampled.shape[1], x_sampled.shape[2]), c.saliency_hw
            )
            idx = jnp.clip(jnp.asarray(pool_s, jnp.int32) - s_min, 0, len(ar_stack) - 1)
            ar = jnp.take(jnp.asarray(ar_stack), idx, axis=0)
            ac = jnp.take(jnp.asarray(ac_stack), idx, axis=0)
            xa = jnp.einsum("ij,bjwc->biwc", ar, x_sampled.astype(jnp.float32))
            xa = jnp.einsum("ij,bhjc->bhic", ac, xa)
            x_sampled = jnp.where(
                jnp.asarray(pool_s, jnp.int32) >= 0,
                xa.astype(x_sampled.dtype), x_sampled,
            )
        feats = self.encoder(self._shard_rows(x_sampled), train=train)
        pred = self._replicate(self.decoder(feats, train=train))
        out = dict(xs=xs, xs_our=xs_our, grid=grid, grid_y=grid_y,
                   x_sampled=x_sampled, pred=pred)
        if c.loss_at_high_res and c.uniform_sample == "BI":
            # uniform-BI + loss_at_high_res: plain bilinear upsample of the
            # prediction to the original size (models.py:930-931)
            out["pred_hr"] = resize_bilinear(
                pred.astype(jnp.float32), (x.shape[1], x.shape[2])
            )
        elif c.loss_at_high_res:
            # MODEL.loss_at_high_res ablation: inverse-warp the prediction
            # to (H, W)//segm_downsampling_rate for a full-res seg loss
            # (models_instance.py:686-690, 754-786). Differentiable wrt
            # pred: the JFA/fill indices come from the valid mask only,
            # gradients flow through the row gather.
            seg_hw = (
                x.shape[1] // c.segm_downsampling_rate,
                x.shape[2] // c.segm_downsampling_rate,
            )
            task_idx, valid = inverse_grid_index(grid, seg_hw)
            jfa_iters = c.jfa_iters or None
            jfa_rounds = None if c.jfa_iters else jfa_rounds_from_grid(grid, seg_hw)
            if c.rev_deform_interp == "nearest":
                pred_hr = unwarp_prediction_fast(
                    pred.astype(jnp.float32), task_idx, valid, jfa_iters, jfa_rounds
                )
            else:
                th, tw = grid.shape[1], grid.shape[2]
                safe = jnp.maximum(task_idx, 0)
                gx = jnp.where(valid, (safe % tw) / tw * 2.0 - 1.0, jnp.nan)
                gy = jnp.where(valid, (safe // tw) / th * 2.0 - 1.0, jnp.nan)
                grid_inv = jnp.stack([gx, gy], axis=-1)
                pred_hr = unwarp_prediction(
                    pred.astype(jnp.float32), grid_inv, valid, interp=c.rev_deform_interp
                )
            out["pred_hr"] = pred_hr
        return out

    def infer(
        self,
        x,
        focus_point,
        seg_hw: tuple[int, int] | None = None,
        y=None,
        y_sampled_reverse: bool = False,
        x_sampled_reverse: bool = False,
        argmax_labels: bool = False,
    ):
        """Full-resolution inference with inverse warp + hole fill
        (models/models_instance.py:839-949). Returns dict with
        ``pred_sampled`` [B, Hs, Ws, C] full-res logits and intermediates;
        the optional VAL.y_sampled_reverse / VAL.x_sampled_reverse round
        trips (models_instance.py:875-933) are computed when requested."""
        c = self.config
        seg_hw = seg_hw or (x.shape[1], x.shape[2])
        xs = self.saliency(x, focus_point, train=False)
        # gt_gradient / uniform_sample overrides apply at inference too — the
        # reference's branch runs before the train/inference split
        # (models/models.py:735-818, common code above the segSize check)
        xs = self._apply_overrides(xs, y, None)
        # the grid itself is built at the inference task size so grid, pred,
        # and the inverse indices all share one resolution (the reference
        # upsamples the grid to input_size_net_infer, models/models.py
        # create_grid; a post-hoc resize of x_sampled would leave the inverse
        # indices normalized by the wrong th/tw)
        grid, grid_y = self.grids(xs, task_hw=c.task_hw_infer, label_hw=c.task_hw_infer)
        if c.uniform_sample == "BI":
            # uniform-BI baseline: plain bilinear downsample of the image
            # (models_instance.py:848-849)
            x_sampled = resize_bilinear(x.astype(self.dtype), c.task_hw_infer)
        else:
            x_sampled = grid_sample(x.astype(self.dtype), grid)
        feats = self.encoder(self._shard_rows(x_sampled), train=False)
        pred = self._replicate(self.decoder(feats, train=False))
        task_idx, valid = inverse_grid_index(grid, seg_hw)
        th, tw = grid.shape[1], grid.shape[2]
        safe = jnp.maximum(task_idx, 0)
        gx = jnp.where(valid, (safe % tw) / tw * 2.0 - 1.0, jnp.nan)
        gy = jnp.where(valid, (safe // tw) / th * 2.0 - 1.0, jnp.nan)
        grid_inv = jnp.stack([gx, gy], axis=-1)
        # JFA chain length: fixed via TPU.jfa_iters, else bounded at runtime
        # by the grid geometry (max warped-cell diagonal — VERDICT r1 item 3)
        jfa_iters = c.jfa_iters or None
        jfa_rounds = None if c.jfa_iters else jfa_rounds_from_grid(grid, seg_hw)
        pred_label = None
        if c.uniform_sample in ("BI", "nearest"):
            # uniform baselines: the "inverse warp" is a plain upsample of
            # the prediction (models_instance.py:868-874)
            if c.uniform_sample == "BI":
                pred_sampled = resize_bilinear(pred.astype(jnp.float32), seg_hw)
            else:
                pred_sampled = resize_nearest(pred.astype(jnp.float32), seg_hw)
            if argmax_labels:
                pred_label = jnp.argmax(pred_sampled, axis=-1).astype(jnp.int32)
        elif argmax_labels and c.rev_deform_interp == "nearest":
            # serving path: argmax commutes with the row-gather inverse warp,
            # so gather one int32 channel instead of C float channels — exact
            # for every metric computed from argmax(pred_sampled)
            pred_label = unwarp_argmax_scatter(
                pred.astype(jnp.float32), grid, seg_hw, jfa_iters, jfa_rounds
            )
            pred_sampled = None
        elif c.rev_deform_interp == "nearest":
            # exact fast path: payload JFA + one gather (core/unwarp.py);
            # TPU.scoremap_gather_bf16 opts into the cheaper rounded gather
            pred_sampled = unwarp_prediction_fast(
                pred.astype(jnp.float32), task_idx, valid, jfa_iters, jfa_rounds,
                gather_bf16=c.scoremap_gather_bf16,
                gather_impl=c.scoremap_gather,
            )
        else:
            pred_sampled = unwarp_prediction(
                pred.astype(jnp.float32), grid_inv, valid, interp=c.rev_deform_interp
            )
            if argmax_labels:
                pred_label = jnp.argmax(pred_sampled, axis=-1).astype(jnp.int32)
        out = dict(
            xs=xs,
            grid=grid,
            grid_y=grid_y,
            grid_inv=grid_inv,
            unfilled_mask=~valid,
            x_sampled=x_sampled,
            pred=pred,
        )
        if pred_sampled is not None:
            out["pred_sampled"] = pred_sampled
        if pred_label is not None:
            out["pred_label"] = pred_label
        if y_sampled_reverse and y is not None:
            # intrinsic-upsampling-error probe: label down then back up,
            # branched on rev_deform_interp like the reference
            # (models_instance.py:910-933)
            if c.uniform_sample == "BI":
                # uniform-BI: bilinear downsample + .long() truncation, then
                # a plain nearest upsample back (models_instance.py:862-877)
                y_s = jnp.floor(
                    resize_bilinear(y.astype(jnp.float32)[..., None], c.task_hw_infer)
                )
                out["y_sampled"] = y_s[..., 0]
                out["y_sampled_reverse"] = resize_nearest(y_s, seg_hw)[..., 0]
            else:
                y_s = grid_sample(y.astype(jnp.float32)[..., None], grid_y, mode="nearest")
                out["y_sampled"] = y_s[..., 0]
                if c.rev_deform_interp == "nearest":
                    # nearest gather (grid_sample mode='nearest', :914) +
                    # nearest hole fill — exact integer round trip
                    out["y_sampled_reverse"] = unwarp_labels_fast(
                        y_s, task_idx, valid, jfa_iters, jfa_rounds
                    )[..., 0]
                elif c.rev_deform_interp == "BI":
                    # nearest gather, holes filled by value interpolation
                    # (fillMissingValues BI on raw class ids, :912-920 — the
                    # reference yields fractional labels at holes)
                    grid_safe = jnp.where(jnp.isnan(grid_inv), 0.0, grid_inv)
                    sampled = grid_sample(y_s, grid_safe, mode="nearest")
                    sampled = sampled * valid[..., None].astype(sampled.dtype)
                    out["y_sampled_reverse"] = fill_values_splat(sampled, valid)[..., 0]
                else:
                    # 'tri' (the defaults.py default): one-hot score planes,
                    # bilinear inverse warp, value fill, argmax (:922-933)
                    scores = jax.nn.one_hot(
                        y_s[..., 0].astype(jnp.int32), c.num_class, dtype=jnp.float32
                    )
                    rev = unwarp_prediction(scores, grid_inv, valid, interp=c.rev_deform_interp)
                    out["y_sampled_reverse"] = jnp.argmax(rev, axis=-1).astype(jnp.float32)
        if x_sampled_reverse:
            if c.uniform_sample == "BI":
                # plain bilinear upsample of the uniform downsample
                # (models_instance.py:878-880)
                out["x_sampled_reverse"] = resize_bilinear(
                    x_sampled.astype(jnp.float32), seg_hw
                )
            else:
                out["x_sampled_reverse"] = unwarp_prediction(
                    x_sampled.astype(jnp.float32), grid_inv, valid,
                    interp=c.rev_deform_interp,
                )
        return out
