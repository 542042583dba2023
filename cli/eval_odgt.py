"""Legacy multi-scale ODGT evaluation driver (ADE20K / Cityscapes configs).

Counterpart of the reference's full-inference ``evaluate``
(/root/reference/eval.py:86-369): consume ``ValDataset``'s multi-scale
``img_data`` list, run the deform module's full-res inference branch per
scale, average the inverse-warped class scores across scales
(``scores += scores_tmp / len(imgSizes)``, eval.py:185), and report full-res
accuracy + per-class IoU (with the family's ignore-index handling,
eval.py:228-252) plus warped-domain ("deformed") metrics and the optional
``VAL.y_sampled_reverse`` round-trip probe.

``--no-deform`` instead evaluates a plain (non-foveated)
``SegmentationModule`` — the reference's ``eval.py:main`` path
(eval.py:509-544): per-scale softmax probabilities resized to full res and
averaged, full-res accuracy/IoU only (no warped domain exists).

Gaze policy: the legacy ODGT records carry no gaze point; the reference's
shipped ``evaluate`` only runs on gaze-tuple datasets (eval.py:137 unpacks
``(X, F, Y, cls)``) and is latently broken for ValDataset inputs. Here the
driver defines the gaze explicitly: ``--gaze r c`` (default 0.5 0.5, image
center), making ``configs/ade20k.yaml`` exercisable end to end.

Compile cost: ``infer_scale`` jit-keys on the exact (input, seg) shapes, so
a variably-sized val set (ADE20K) compiles once per DISTINCT image size per
pyramid level — exact-parity with the reference's dynamic-shape GPU eval, at
real XLA compile cost on a full run. For throughput over parity, pre-pad the
dataset to a small set of canonical shapes or use the shape-bucketed
``fovealseg_tpu.models.bucketed`` (pads to bucket canvases: one executable
per bucket, numerics differ at padded borders).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description="fovealseg-tpu multi-scale ODGT eval")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--gpus", default="0")
    parser.add_argument("--gaze", type=float, nargs=2, default=(0.5, 0.5),
                        help="normalized (row, col) gaze for the foveation")
    parser.add_argument("--no-deform", action="store_true",
                        help="evaluate a plain (non-foveated) SegmentationModule "
                             "— the reference's eval.py:main path (eval.py:509-524): "
                             "encoder->decoder softmax probs per scale, averaged, "
                             "full-res metrics only")
    parser.add_argument("--num-samples", type=int, default=-1)
    parser.add_argument("--object-info", default=None,
                        help="object150_info.csv-style class metadata (optional; "
                             "generic names are synthesized otherwise)")
    parser.add_argument("--torch-ckpt", default=None)
    parser.add_argument("--torch-epoch", default="last")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.core import metrics as M
    from fovealseg_tpu.core.warp import grid_sample
    from fovealseg_tpu.data.odgt import ValDataset, warn_dead_options
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
    log = logging.getLogger("fovealseg.eval_odgt")
    warn_dead_options(cfg, log)
    if cfg.VAL.ensemble or cfg.VAL.approx_pred_Fxlr_by_ensemble:
        raise NotImplementedError(
            "VAL.ensemble / VAL.approx_pred_Fxlr_by_ensemble are not "
            "implemented (untested fixed-patch ensemble in the reference)"
        )

    ds = ValDataset(
        root_dataset=cfg.DATASET.root_dataset,
        odgt=cfg.DATASET.list_val,
        num_class=cfg.DATASET.num_class,
        class_mapping=cfg.DATASET.class_mapping,
        list_train=cfg.DATASET.list_train,
        imgSizes=tuple(cfg.DATASET.imgSizes) if isinstance(cfg.DATASET.imgSizes, (list, tuple)) else (cfg.DATASET.imgSizes,),
        imgMaxSize=cfg.DATASET.imgMaxSize,
        padding_constant=cfg.DATASET.padding_constant,
        segm_downsampling_rate=cfg.DATASET.segm_downsampling_rate,
        binary_class=cfg.DATASET.binary_class,
        val_central_crop=cfg.DATASET.val_central_crop,
        val_central_crop_shape=tuple(cfg.DATASET.val_central_crop_shape),
        expand_prediection_rate=cfg.VAL.expand_prediection_rate,
    )
    n_samples = len(ds) if args.num_samples < 0 else min(args.num_samples, len(ds))
    log.info("ValDataset: %d records (%s family), scales %s",
             len(ds), ds.family, ds.imgSizes)

    # family ignore-index handling (eval.py:228-252): cityscapes hard-codes
    # ignore_index=0; other families use DATASET.ignore_index unless -2
    if ds.family == "cityscapes":
        ignore_index = 0
    else:
        ignore_index = cfg.DATASET.ignore_index if cfg.DATASET.ignore_index != -2 else None

    dc = DeformConfig.from_cfg(cfg)
    rec0 = ds[0]
    x0 = jnp.asarray(rec0["img_data"][0])
    if args.no_deform:
        from fovealseg_tpu.models.segmentation_module import SegmentationModule

        module = SegmentationModule(config=dc)
        variables = module.init({"params": jax.random.PRNGKey(cfg.TRAIN.seed)}, x0)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
    else:
        module = DeformSegmentation(config=dc)
        tx = create_optimizer(cfg)
        sample = {
            "img_data": x0,
            "focus_point": jnp.asarray([args.gaze], jnp.float32),
        }
        state = init_state(module, tx, jax.random.PRNGKey(cfg.TRAIN.seed), sample)
        params, stats = state.params, state.batch_stats

    weight_keys = {
        "encoder": cfg.MODEL.weights_encoder,
        "decoder": cfg.MODEL.weights_decoder,
    }
    if not args.no_deform:
        weight_keys["saliency"] = cfg.MODEL.weights_net_saliency
        weight_keys["compress"] = cfg.MODEL.weights_net_compress
    if args.torch_ckpt:
        from fovealseg_tpu.train.checkpoint import load_torch_checkpoint

        params, stats = load_torch_checkpoint(args.torch_ckpt, args.torch_epoch, params, stats)
        log.info("imported torch checkpoint from %s", args.torch_ckpt)
    elif any(weight_keys.values()):
        # the reference eval.py:main loads MODEL.weights_{encoder,decoder}
        # and asserts they exist (eval.py:513-521, 584-589)
        from fovealseg_tpu.train.checkpoint import load_torch_weight_files

        for kind, path in weight_keys.items():
            if path and not os.path.exists(path):
                raise FileNotFoundError(f"MODEL.weights_{kind} not found: {path}")
        params, stats = load_torch_weight_files(weight_keys, params, stats)
        log.info("loaded MODEL.weights_* files: %s",
                 {k: v for k, v in weight_keys.items() if v})
    elif not args.no_deform and cfg.TRAIN.start_epoch > 0 and os.path.isdir(cfg.DIR):
        from fovealseg_tpu.train import checkpoint as ckpt

        restored = ckpt.load_checkpoint(cfg.DIR, cfg.TRAIN.start_epoch, state)
        params, stats = restored["params"], restored["batch_stats"]
    else:
        log.warning(
            "no weights loaded (no --torch-ckpt, no MODEL.weights_*, no "
            "resumable checkpoint) — evaluating RANDOMLY INITIALIZED weights; "
            "metrics are only meaningful for smoke tests"
        )

    rev_y = bool(cfg.VAL.y_sampled_reverse) and not args.no_deform
    import functools

    if args.no_deform:
        from fovealseg_tpu.models.segmentation_module import SegmentationModule

        @functools.partial(jax.jit, static_argnames=("seg_hw",))
        def infer_scale(params, stats, x, f, y, seg_hw):
            probs = module.apply(
                {"params": params, "batch_stats": stats}, x,
                seg_hw=seg_hw, method=SegmentationModule.infer,
            )
            return {"pred_sampled": probs}
    else:

        @functools.partial(jax.jit, static_argnames=("seg_hw",))
        def infer_scale(params, stats, x, f, y, seg_hw):
            out = module.apply(
                {"params": params, "batch_stats": stats}, x, f,
                seg_hw=seg_hw, y=y, y_sampled_reverse=rev_y,
                method=DeformSegmentation.infer,
            )
            # warped-domain label for the "deformed" metric family
            # (eval.py:231 acc(pred_deformed, y_sampled))
            y_s = grid_sample(y.astype(jnp.float32)[..., None], out["grid_y"], mode="nearest")[..., 0]
            keep = {"pred_sampled": out["pred_sampled"], "pred": out["pred"], "y_sampled": y_s}
            if rev_y:
                keep["y_sampled_reverse"] = out["y_sampled_reverse"]
            return keep

    f = jnp.asarray([args.gaze], jnp.float32)
    # per-class label-distribution meters (reference eval.py:186-191): mean
    # over samples of the normalized class histogram of the full-res gt and
    # of the deformed (warped-domain) label
    nc = cfg.DATASET.num_class
    y_dist_sum = np.zeros(nc, np.float64)
    y_samp_dist_sum = np.zeros(nc, np.float64)
    inter_sum = union_sum = None
    inter_def = union_def = None
    inter_rev = union_rev = None
    acc_m = acc_def_m = acc_rev_m = 0.0
    per_img_rows: list = []  # VAL.report_per_img_iou
    n = 0
    for idx in range(n_samples):
        rec = ds[idx]
        seg = np.asarray(rec["seg_label"][0], np.int64)  # [H, W], -1 = ignore
        # the reference applies ignore_index only to intersectionAndUnion
        # (eval.py:225-231); accuracy() counts every label >= 0 pixel
        # (eval.py:224, utils.py accuracy) — keep two views of the label
        seg_iou = np.where(seg == ignore_index, -1, seg) if ignore_index is not None else seg
        seg_hw = (seg.shape[0], seg.shape[1])
        y = jnp.asarray(seg[None])
        scores = None
        out = None
        for x_np in rec["img_data"]:
            out = infer_scale(params, stats, jnp.asarray(x_np), f, y, seg_hw)
            s = np.asarray(out["pred_sampled"], np.float32)
            scores = s / len(rec["img_data"]) if scores is None else scores + s / len(rec["img_data"])
        pred = np.argmax(scores[0], axis=-1)
        seg_j = jnp.asarray(seg)
        seg_iou_j = jnp.asarray(seg_iou)
        acc, _ = M.accuracy(jnp.asarray(pred), seg_j)
        acc_m += float(acc)
        i1, u1 = M.intersection_and_union(jnp.asarray(pred), seg_iou_j, cfg.DATASET.num_class)
        inter_sum = i1 if inter_sum is None else inter_sum + i1
        union_sum = u1 if union_sum is None else union_sum + u1
        if cfg.VAL.report_per_img_iou:
            # per-image IoU rows -> {DIR}/image_IoUs_list.csv
            # (reference eval.py:251-257, 283-293)
            img_iou = np.asarray(i1, np.float64) / (np.asarray(u1, np.float64) + 1e-10)
            per_img_rows.append(
                (str(rec.get("info", idx)).split("/")[-1], float(img_iou.mean()),
                 img_iou.tolist())
            )

        if not args.no_deform:
            # deformed (warped-domain) metrics from the last scale (eval.py:210,231)
            pred_def = np.argmax(np.asarray(out["pred"], np.float32)[0], axis=-1)
            y_samp = np.asarray(out["y_sampled"], np.int64)[0]
            h1, _ = np.histogram(seg, bins=nc, range=(0, nc - 1))
            h2, _ = np.histogram(y_samp, bins=nc, range=(0, nc - 1))
            y_dist_sum += h1 / max(h1.sum(), 1)
            y_samp_dist_sum += h2 / max(h2.sum(), 1)
            acc_d, _ = M.accuracy(jnp.asarray(pred_def), jnp.asarray(y_samp))
            acc_def_m += float(acc_d)
            i2, u2 = M.intersection_and_union(jnp.asarray(pred_def), jnp.asarray(y_samp), cfg.DATASET.num_class)
            inter_def = i2 if inter_def is None else inter_def + i2
            union_def = u2 if union_def is None else union_def + u2

        if cfg.VAL.visualize:
            # side-by-side (img | gt-color | pred-color) dump into
            # {DIR}/result (reference eval.py:70-83, 273-277)
            from PIL import Image as PILImage

            from fovealseg_tpu.utils.ade import color_encode

            img_u8 = np.clip(rec["img_ori"] * 255.0, 0, 255).astype(np.uint8)
            im_vis = np.concatenate(
                (img_u8, color_encode(np.maximum(seg, 0), nc),
                 color_encode(pred, nc)), axis=1)
            dir_result = os.path.join(cfg.DIR, "result")
            os.makedirs(dir_result, exist_ok=True)
            name = str(rec.get("info", idx)).split("/")[-1].replace(".jpg", ".png")
            if not name.endswith(".png"):
                name += ".png"
            PILImage.fromarray(im_vis).save(os.path.join(dir_result, name))

        if rev_y:
            yr = np.asarray(out["y_sampled_reverse"], np.int64)[0]
            acc_r, _ = M.accuracy(jnp.asarray(yr), seg_j)
            acc_rev_m += float(acc_r)
            i3, u3 = M.intersection_and_union(jnp.asarray(yr), seg_iou_j, cfg.DATASET.num_class)
            inter_rev = i3 if inter_rev is None else inter_rev + i3
            union_rev = u3 if union_rev is None else union_rev + u3
        n += 1

    def miou(i, u):
        if i is None or u is None:  # zero samples evaluated
            return 0.0
        i = np.asarray(i, np.float64)
        u = np.asarray(u, np.float64)
        present = u > 0
        return float((i[present] / u[present]).mean()) if present.any() else 0.0

    result = {
        "mean_iou": miou(inter_sum, union_sum),
        "pixel_acc": acc_m / max(n, 1),
        "num_samples": n,
        "scales": list(ds.imgSizes),
    }
    if not args.no_deform:
        result["mean_iou_deformed"] = miou(inter_def, union_def)
        result["pixel_acc_deformed"] = acc_def_m / max(n, 1)
    if rev_y and inter_rev is not None:
        result["y_reverse_iou"] = miou(inter_rev, union_rev)
        result["y_reverse_acc"] = acc_rev_m / max(n, 1)
    # per-class deformed-vs-original label-distribution TB scalars
    # (reference eval.py:326-331 add_scalars tag grammar, flattened to
    # add_scalar "tag/key" form); emitted when VAL.visualize is set
    if cfg.VAL.visualize and n > 0 and not args.no_deform:
        from fovealseg_tpu.utils.observe import SummaryWriter

        writer = SummaryWriter(os.path.join(cfg.DIR, "tensorboard"))
        y_dist = y_dist_sum / n
        y_samp_dist = y_samp_dist_sum / n
        for c in range(nc):
            tag = f"Eval Deformed Label vs Label Original distribution Class {c}"
            writer.add_scalar(f"{tag}/Label Original distribution",
                              float(y_dist[c]), cfg.TRAIN.start_epoch)
            writer.add_scalar(f"{tag}/Deformed Label",
                              float(y_samp_dist[c]), cfg.TRAIN.start_epoch)
        writer.close()
    if cfg.VAL.report_per_img_iou and per_img_rows:
        # worst-first per-image IoU table (reference sorts by image_mIoU and
        # writes {DIR}/image_IoUs_list.csv with idx label, eval.py:283-293)
        import csv

        per_img_rows.sort(key=lambda r: r[1])
        os.makedirs(cfg.DIR, exist_ok=True)
        with open(os.path.join(cfg.DIR, "image_IoUs_list.csv"), "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["idx", "image_name", "image_mIoU"]
                       + [f"img_iou_class_{c}" for c in range(nc)])
            for i, (name, miou_v, per_cls) in enumerate(per_img_rows):
                w.writerow([i, name, miou_v] + per_cls)
        log.info("per-image IoU table: %s", os.path.join(cfg.DIR, "image_IoUs_list.csv"))
    # per-class report with object-info names (reference eval.py:39,345-350;
    # names synthesized when the csv asset is absent)
    from fovealseg_tpu.utils.ade import class_names

    names = class_names(args.object_info, cfg.DATASET.num_class)
    if inter_sum is not None:
        i_np = np.asarray(inter_sum, np.float64)
        u_np = np.asarray(union_sum, np.float64)
        for c in range(cfg.DATASET.num_class):
            if u_np[c] > 0:
                log.info("class [%d] %s, IoU: %.4f", c, names[c], i_np[c] / u_np[c])
    log.info("multi-scale eval: %s", json.dumps(result))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
