"""Full-resolution evaluation CLI (inverse-warp path).

Counterpart of /root/reference/eval.py: run the FSNet inference branch
(models/models_instance.py:839-949) — forward warp, segment, inverse warp
with hole filling — and report full-res IoU / pixel accuracy plus the
warped-domain metrics. Supports importing the reference's PyTorch 4-file
checkpoints for parity (``--torch-ckpt DIR --torch-epoch N``).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description="fovealseg-tpu full-res eval")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--gpus", default="0")
    parser.add_argument("--data", default="synthetic")
    parser.add_argument("--image-root", default=None)
    parser.add_argument("--torch-ckpt", default=None, help="dir with {kind}_epoch_{N}.pth files")
    parser.add_argument("--torch-epoch", default="last")
    parser.add_argument("--num-batches", type=int, default=16)
    parser.add_argument("--canvas", type=int, default=640, help="synthetic canvas size")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.core import metrics as M
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import init_state

    cfg = get_default_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    from fovealseg_tpu.configs import setup_compile_cache

    setup_compile_cache(cfg)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("fovealseg.eval")
    from fovealseg_tpu.configs import audit_dead_keys

    audit_dead_keys(cfg, log)

    if cfg.VAL.ensemble or cfg.VAL.approx_pred_Fxlr_by_ensemble:
        # near-dead reference option (defaults.py:217-220, marked "NEED
        # TEST" upstream) — reject loudly rather than silently ignore
        raise NotImplementedError(
            "VAL.ensemble / VAL.approx_pred_Fxlr_by_ensemble are not "
            "implemented (untested fixed-patch ensemble baseline in the "
            "reference); unset them or use the standard eval path"
        )

    dc = DeformConfig.from_cfg(cfg)
    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else jnp.float32
    if cfg.TPU.quantize:
        assert cfg.TPU.quantize == "int8", f"unknown TPU.quantize {cfg.TPU.quantize!r}"
        from fovealseg_tpu.models.layers import set_quantization

        set_quantization(True)  # trace-time flag; inference-only W8A8
    if cfg.TPU.conv_pack:
        from fovealseg_tpu.models.layers import set_conv_packing

        set_conv_packing(True)  # trace-time flag; eval is forward-only
    module = DeformSegmentation(config=dc, dtype=dtype)
    tx = create_optimizer(cfg)
    bg = cfg.DATASET.num_class - 1

    if args.data == "synthetic":
        from fovealseg_tpu.data.synthetic import make_batch

        rng_np = np.random.default_rng(cfg.TRAIN.seed)

        def loader():
            for _ in range(args.num_batches):
                yield make_batch(rng_np, cfg.VAL.batch_size, canvas=args.canvas)
    else:
        from fovealseg_tpu.data.lvis import DatasetLVIS

        ds = DatasetLVIS(os.path.join(args.data, "valid"), args.image_root,
                         marker=cfg.DATASET.dataset_marker_valid)

        def loader():
            for i, b in enumerate(ds.batches(cfg.VAL.batch_size, shuffle=False)):
                if i >= args.num_batches:
                    break
                yield b

    sample = {k: jnp.asarray(v) for k, v in next(iter(loader())).items()}
    state = init_state(module, tx, jax.random.PRNGKey(cfg.TRAIN.seed), sample)
    params, stats = state.params, state.batch_stats

    if args.torch_ckpt:
        from fovealseg_tpu.train.checkpoint import load_torch_checkpoint

        params, stats = load_torch_checkpoint(args.torch_ckpt, args.torch_epoch, params, stats)
        log.info("imported torch checkpoint from %s", args.torch_ckpt)
    elif any((cfg.MODEL.weights_encoder, cfg.MODEL.weights_decoder,
              cfg.MODEL.weights_net_saliency, cfg.MODEL.weights_net_compress)):
        # MODEL.weights_* per-net torch files (eval.py:463-487 reloads the
        # 4 nets from explicit paths each eval epoch)
        from fovealseg_tpu.train.checkpoint import load_torch_weight_files

        params, stats = load_torch_weight_files(
            {"encoder": cfg.MODEL.weights_encoder,
             "decoder": cfg.MODEL.weights_decoder,
             "saliency": cfg.MODEL.weights_net_saliency,
             "compress": cfg.MODEL.weights_net_compress},
            params, stats,
        )
        log.info("loaded per-net torch weights from MODEL.weights_*")
    elif cfg.TRAIN.start_epoch > 0 and os.path.isdir(cfg.DIR):
        from fovealseg_tpu.train import checkpoint as ckpt

        restored = ckpt.load_checkpoint(cfg.DIR, cfg.TRAIN.start_epoch, state)
        params, stats = restored["params"], restored["batch_stats"]
    else:
        log.warning(
            "no weights loaded (no --torch-ckpt, no MODEL.weights_*, no "
            "resumable checkpoint) — evaluating RANDOMLY INITIALIZED weights; "
            "metrics are only meaningful for smoke tests"
        )

    rev_y = bool(cfg.VAL.y_sampled_reverse)
    rev_x = bool(cfg.VAL.x_sampled_reverse)
    # metrics only need argmax(pred_sampled); when no visualization asks for
    # the full score map, run the argmax-only inverse warp (gathers one int32
    # channel instead of num_class floats — exact, see unwarp_argmax_fast)
    argmax_only = not bool(cfg.VAL.visualize or cfg.TRAIN.train_eval_visualise)

    quant = None
    if cfg.TPU.quantize:
        from fovealseg_tpu.models.layers import quantize_params, quantized_kernel_paths

        paths = quantized_kernel_paths(
            module, {"params": params, "batch_stats": stats},
            sample["img_data"], sample["focus_point"],
            argmax_labels=argmax_only, method=DeformSegmentation.infer,
        )
        quant = quantize_params(params, paths)  # hoisted out of the eval loop

    @jax.jit
    def infer(params, stats, x, f, y):
        variables = {"params": params, "batch_stats": stats}
        if quant is not None:
            variables["quant"] = quant
        return module.apply(
            variables, x, f,
            y=y, y_sampled_reverse=rev_y, x_sampled_reverse=rev_x,
            argmax_labels=argmax_only,
            method=DeformSegmentation.infer,
        )

    # eval visualization surface: TB add_image set for the first 4 batches
    # (models_instance.py:952, 1022-1105 tag grammar) + PNG dump set under
    # {DIR}/valid_visual_epoch{N} (models/models.py:977-980)
    visualize = bool(cfg.VAL.visualize or cfg.TRAIN.train_eval_visualise)
    writer = None
    if visualize:
        from fovealseg_tpu.utils.observe import SummaryWriter

        os.makedirs(cfg.DIR, exist_ok=True)
        writer = SummaryWriter(os.path.join(cfg.DIR, "tensorboard"))
        vis_dir = os.path.join(cfg.DIR, f"valid_visual_epoch{cfg.TRAIN.start_epoch}")

    def _emit_visuals(bi, x_np, out, pred_cls, gt):
        from fovealseg_tpu.utils.visuals import dump_train_visuals, rgb_img

        nc = cfg.DATASET.num_class
        sm = np.asarray(out["xs"][..., 0], np.float32)
        x_warp = np.asarray(out["x_sampled"], np.float32)
        pred_full = np.asarray(out["pred_sampled"], np.float32)
        for i in range(min(x_np.shape[0], 2)):
            k = bi * cfg.VAL.batch_size + i
            s = sm[i] / (sm[i].max() + 1e-12)
            writer.add_image(f"eval_{k}/Saliency Map", np.repeat(s[..., None], 3, -1), bi)
            writer.add_image(f"eval_{k}/Deformed Image", x_warp[i], bi)
            writer.add_image(
                f"eval_{k}/Deformed pred",
                np.asarray(rgb_img(np.argmax(np.asarray(out["pred"], np.float32)[i], -1), nc),
                           np.float32) / 255.0, bi)
            writer.add_image(
                f"eval_{k}/Interpolated Deformed Pred",
                np.asarray(rgb_img(np.argmax(pred_full[i], -1), nc), np.float32) / 255.0, bi)
            writer.add_image(
                f"eval_{k}/Label Original",
                np.asarray(rgb_img(gt[i], nc), np.float32) / 255.0, bi)
            dump_train_visuals(
                vis_dir, f"iter{bi}_batch{i}",
                pred_logits=pred_full[i], gt_hr=gt[i], saliency=sm[i],
                num_classes=nc)
            if bi == 0:
                # side-by-side (img | gt-color | pred-color) visualize_result
                # dumps into {DIR}/result (reference eval.py:70-83, 273-277),
                # first batch only
                from PIL import Image as PILImage

                from fovealseg_tpu.utils.ade import color_encode

                img_u8 = np.clip(x_np[i] * 255.0, 0, 255).astype(np.uint8)
                im_vis = np.concatenate(
                    (img_u8, color_encode(np.maximum(gt[i], 0), nc),
                     color_encode(pred_cls[i], nc)), axis=1)
                rdir = os.path.join(cfg.DIR, "result")
                os.makedirs(rdir, exist_ok=True)
                PILImage.fromarray(im_vis).save(
                    os.path.join(rdir, f"batch{bi}_sample{i}.png"))

    # Reference-exact 'tri' (the defaults.py default interp): replace the
    # in-graph Gaussian-splat approximation of fillMissingValues with the
    # Delaunay-barycentric fill — host plan per sample (native Bowyer-Watson
    # + barycentric find_simplex, /root/reference/interp2d.py:14-91) and a
    # jitted on-device gather+matmul blend. TPU.tri_exact=False keeps the
    # all-device splat (error envelope: tests/test_tri_parity.py).
    tri_exact = (
        cfg.MODEL.rev_deform_interp == "tri"
        and cfg.MODEL.uniform_sample == ""
        and bool(cfg.TPU.tri_exact)
    )
    if tri_exact:
        from fovealseg_tpu.native.interp2d import unwarp_prediction_tri_device

        log.info("tri_exact: Delaunay-barycentric hole fill active "
                 "(TPU.tri_exact=False for the all-device splat)")

    inter_sum = None
    union_sum = None
    acc_m, n = 0.0, 0
    yrev_inter = yrev_union = None  # intrinsic-upsampling-error probe
    dices: list = []
    hd95s: list = []
    trimaps: dict = {}  # dilation width -> per-sample band accuracies
    for batch in loader():
        x = jnp.asarray(batch["img_data"])
        f = jnp.asarray(batch["focus_point"])
        y = np.asarray(batch["seg_label"])
        cls = np.asarray(batch["cls_label"]).reshape(-1)
        gt = (y * cls[:, None, None] + (1 - y) * bg).astype(np.int64)
        out = infer(params, stats, x, f, jnp.asarray(gt))
        if tri_exact:
            out = dict(out)
            out["pred_sampled"] = unwarp_prediction_tri_device(
                out["pred"], out["grid_inv"], ~np.asarray(out["unfilled_mask"])
            )
            out.pop("pred_label", None)  # re-derive argmax from the exact fill
        if "pred_label" in out:
            pred = np.asarray(out["pred_label"], np.int64)
        else:
            pred = np.argmax(np.asarray(out["pred_sampled"]), axis=-1)
        if visualize and n < 4:
            _emit_visuals(n, np.asarray(x), out, pred, gt)
        if rev_y:
            # VAL.y_sampled_reverse: how much IoU the warp round-trip alone
            # costs (reference eval.py:178-269 'y_sampled_reverse' probe) —
            # compares gt against gt warped down and inverse-warped back up
            yr = np.asarray(out["y_sampled_reverse"]).astype(np.int64)
            i2, u2 = M.intersection_and_union(
                jnp.asarray(yr), jnp.asarray(gt), cfg.DATASET.num_class
            )
            yrev_inter = i2 if yrev_inter is None else yrev_inter + i2
            yrev_union = u2 if yrev_union is None else yrev_union + u2
        inter, union = M.intersection_and_union(
            jnp.asarray(pred), jnp.asarray(gt), cfg.DATASET.num_class
        )
        inter_sum = inter if inter_sum is None else inter_sum + inter
        union_sum = union if union_sum is None else union_sum + union
        acc, _ = M.accuracy(jnp.asarray(pred), jnp.asarray(gt))
        acc_m += float(acc)
        # optional VAL metrics (eval.py VAL.dice / VAL.hd95 / VAL.trimap)
        for b in range(pred.shape[0]):
            pred_fg = pred[b] != bg
            gt_fg = gt[b] != bg
            if cfg.VAL.dice:
                dices.append(M.binary_dice(pred_fg, gt_fg))
            if cfg.VAL.hd95 and gt_fg.any():
                h = M.hd95(pred_fg, gt_fg)
                if h == h:
                    hd95s.append(h)
            if cfg.VAL.trimap:
                # the reference evaluates one band per dilation width
                # 2^i, i in 0..trimap_dia_factor (trim_accuracy,
                # eval.py:50-66), not a single band
                for i_w in range(cfg.VAL.trimap_dia_factor + 1):
                    w = 2 ** i_w
                    t = M.trimap_accuracy(pred[b], gt[b], w)
                    if t == t:
                        trimaps.setdefault(w, []).append(t)
                    if cfg.VAL.trimap_visual_check and n == 0 and b == 0:
                        # band/masked-label/masked-pred npy dump set
                        # (reference trim_accuracy, eval.py:56-66) — the
                        # filenames are width-keyed only, so dump once
                        # (the reference overwrites per sample; the last
                        # write is the only survivor there)
                        tdir = os.path.join(cfg.DIR, "trimap_visual_check")
                        os.makedirs(tdir, exist_ok=True)
                        band = M.trimap_band(gt[b], w)
                        np.save(os.path.join(tdir, f"seg_label_Edges_dil_{w}.npy"), band)
                        np.save(os.path.join(tdir, f"masked_label_dil_{w}.npy"), band * gt[b])
                        np.save(os.path.join(tdir, f"masked_pred_dil_{w}.npy"), band * pred[b])
        n += 1

    iou = np.asarray(inter_sum) / np.maximum(np.asarray(union_sum), 1e-10)
    present = np.asarray(union_sum) > 0
    result = {
        "mean_iou": float(iou[present].mean()),
        "pixel_acc": acc_m / max(n, 1),
        "num_batches": n,
        "per_class_iou": {int(i): float(v) for i, v in enumerate(iou) if present[i]},
    }
    if dices:
        result["dice"] = float(np.mean(dices))
    if hd95s:
        result["hd95"] = float(np.mean(hd95s))
    if trimaps:
        # per-width mean band accuracy + the reference's
        # trimap_last_count_{N}.csv table (eval.py:295-310)
        widths = sorted(trimaps)
        result["trimap_acc"] = {int(w): float(np.mean(trimaps[w])) for w in widths}
        import csv

        count = len(trimaps[widths[0]])
        os.makedirs(cfg.DIR, exist_ok=True)
        with open(os.path.join(cfg.DIR, f"trimap_last_count_{count}.csv"),
                  "w", newline="") as fh:
            cw = csv.writer(fh)
            cw.writerow(["idx", "trim_acc", "trim_width"])
            for i_r, w in enumerate(widths):
                cw.writerow([i_r, float(np.mean(trimaps[w])), w])
    if rev_y and yrev_union is not None:
        yiou = np.asarray(yrev_inter) / np.maximum(np.asarray(yrev_union), 1e-10)
        ypresent = np.asarray(yrev_union) > 0
        result["y_reverse_iou"] = float(yiou[ypresent].mean())
    if writer is not None:
        writer.close()
    log.info("eval: mean_iou=%.4f acc=%.4f", result["mean_iou"], result["pixel_acc"])
    print(json.dumps({k: v for k, v in result.items() if k != "per_class_iou"}))
    return result


if __name__ == "__main__":
    main()
