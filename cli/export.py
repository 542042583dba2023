"""Export the serving graph as a serialized StableHLO artifact.

Beyond-reference production surface: package the full foveated-inference
pipeline (gaze map -> saliency -> grid solve -> warp -> segment -> gather-
free argmax inverse warp) plus its weights into ONE self-contained
``jax.export`` artifact that any JAX process can ``deserialize`` and call —
no model code, no config tree, no checkpoint loader at the serving site.

Usage:
  python cli/export.py --cfg fovealseg_tpu/configs/deform.yaml \
      --out model.stablehlo [--batch 8 --canvas 640] \
      [--torch-ckpt DIR --torch-epoch N | DIR <orbax run dir> TRAIN.start_epoch N]

Load + serve:
  from jax import export
  fn = export.deserialize(open("model.stablehlo", "rb").read()).call
  masks = fn(images_f32_BHW3, gaze_B2)   # -> int32 [B, H, W] class ids

Migration-back path: ``--format torch --out DIR`` instead writes the
reference's 4-file checkpoint surface
(``{saliency,compress,encoder,decoder}_epoch_{N|last}.pth``,
/root/reference/train_deform_semantic.py:166-208) so weights trained here can
be evaluated or fine-tuned by the reference's own drivers.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description="fovealseg-tpu export")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--out", required=True, help="output artifact path")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--canvas", type=int, default=640)
    parser.add_argument("--scores", action="store_true",
                        help="export the full-score pred_sampled instead of argmax labels")
    parser.add_argument("--format", choices=["stablehlo", "torch"], default="stablehlo",
                        help="'torch' writes the reference's 4-file .pth checkpoint "
                             "({saliency,compress,encoder,decoder}_epoch_*.pth) into "
                             "the --out directory so the reference's own drivers can "
                             "consume weights trained here")
    parser.add_argument("--torch-ckpt", default=None)
    parser.add_argument("--torch-epoch", default="last")
    parser.add_argument("--allow-random", action="store_true",
                        help="permit exporting RANDOMLY INITIALIZED weights "
                             "(smoke tests only; refused otherwise for every "
                             "--format — a graph-inspection stablehlo export "
                             "needs the flag too)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fovealseg_tpu.configs import get_default_cfg, setup_compile_cache
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

    cfg = get_default_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    setup_compile_cache(cfg)

    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else jnp.float32
    dcfg = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dcfg, dtype=dtype)

    x0 = jnp.zeros((args.batch, args.canvas, args.canvas, 3), jnp.float32)
    f0 = jnp.full((args.batch, 2), 0.5, jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(cfg.TRAIN.seed)}, x0, f0)
    params, stats = variables["params"], variables.get("batch_stats", {})
    source = "random"  # until a checkpoint overwrites the module.init weights
    if args.torch_ckpt:
        from fovealseg_tpu.train.checkpoint import load_torch_checkpoint

        params, stats = load_torch_checkpoint(
            args.torch_ckpt, args.torch_epoch, params, stats
        )
        source = "torch_ckpt"
    elif cfg.TRAIN.start_epoch > 0 and os.path.isdir(cfg.DIR):
        from fovealseg_tpu.train.optim import create_optimizer
        from fovealseg_tpu.train import checkpoint as ckpt
        from fovealseg_tpu.train.step import init_state

        state = init_state(module, create_optimizer(cfg),
                           jax.random.PRNGKey(cfg.TRAIN.seed),
                           {"img_data": x0, "focus_point": f0})
        restored = ckpt.load_checkpoint(cfg.DIR, cfg.TRAIN.start_epoch, state)
        params, stats = restored["params"], restored["batch_stats"]
        source = "orbax"

    if source == "random" and not args.allow_random:
        # mirror cli/eval's RANDOMLY INITIALIZED warning — but exporting is
        # handing weights to a downstream consumer, so refuse instead
        parser.error(
            "no weight source (no --torch-ckpt, and TRAIN.start_epoch/DIR do "
            "not name a resumable checkpoint): refusing to export RANDOMLY "
            "INITIALIZED weights. Pass --allow-random for smoke tests."
        )

    if args.format == "torch":
        from fovealseg_tpu.train.checkpoint import save_torch_checkpoint

        # the tag names the actual weight source: --torch-epoch for a torch
        # re-export, TRAIN.start_epoch for an orbax restore, else 'last'
        if source == "torch_ckpt":
            tag = args.torch_epoch
        elif source == "orbax":
            tag = cfg.TRAIN.start_epoch
        else:
            tag = "last"
        written = save_torch_checkpoint(args.out, tag, params, stats,
                                        also_last=(str(tag) != "last"))
        print(f"wrote {len(written)} reference-format .pth files under {args.out} "
              f"(epoch tag {tag}"
              + (" + _last mirrors)" if str(tag) != "last" else ")"))
        return

    out_key = "pred_sampled" if args.scores else "pred_label"

    # weights are closed over, so the artifact is fully self-contained; the
    # two runtime inputs are (images, gaze)
    def serve(x, f):
        return module.apply(
            {"params": params, "batch_stats": stats}, x, f,
            argmax_labels=not args.scores, method=DeformSegmentation.infer,
        )[out_key]

    from jax import export as jexport

    exported = jexport.export(jax.jit(serve))(x0, f0)
    data = exported.serialize()
    with open(args.out, "wb") as fh:
        fh.write(data)
    print(
        f"wrote {args.out}: {len(data)/1e6:.1f} MB, platforms="
        f"{list(exported.platforms)}, in={[str(s.shape) for s in exported.in_avals]}, "
        f"out={[str(a.shape) + ':' + str(a.dtype) for a in exported.out_avals]}"
    )


if __name__ == "__main__":
    main()
