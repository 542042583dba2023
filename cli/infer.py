"""Production serving CLI: gaze-conditioned full-res segmentation of images.

Beyond-reference surface (the reference ships train/eval drivers only): load
a checkpoint (orbax or the reference's 4-file torch format), stream a folder
of images (or synthetic frames) with gaze points through the jitted
foveated-inference pipeline, and write full-resolution class-id masks (.npy,
and .png previews with the HSV palette when --png). Uses the gather-free
argmax serving path (``core/unwarp.py::unwarp_argmax_scatter`` — exact
argmax of the reference's ``pred_sampled``, models_instance.py:839-949) and
double-buffered host->device transfer. Prints a one-line JSON throughput
summary.

Usage:
  python cli/infer.py --cfg fovealseg_tpu/configs/deform.yaml \
      [--images DIR --gaze gaze.json | --num-batches N] [--out DIR]
  gaze.json: {"<image filename>": [fy, fx], ...} in [0,1]^2 (default center).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iter_image_batches(image_dir, gaze_map, canvas, batch):
    """Yield (names, imgs [B,H,W,3] f32, gaze [B,2] f32) from a folder,
    resizing each frame to the square canvas."""
    import numpy as np
    from PIL import Image

    names = sorted(
        n for n in os.listdir(image_dir)
        if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    for i in range(0, len(names), batch):
        chunk = names[i : i + batch]
        # pad the last batch to the jitted batch size but report/write only
        # the real frames (names stays short; masks beyond it are dropped)
        padded = chunk + [chunk[-1]] * (batch - len(chunk))
        imgs, gazes = [], []
        for n in padded:
            im = Image.open(os.path.join(image_dir, n)).convert("RGB")
            im = im.resize((canvas, canvas))
            imgs.append(np.asarray(im, np.float32) / 255.0)
            gazes.append(np.asarray(gaze_map.get(n, (0.5, 0.5)), np.float32))
        yield chunk, np.stack(imgs), np.stack(gazes)


def _microbatches(batches, micro):
    """Split each (names, imgs, gazes) batch into chunks of ``micro`` frames.

    The serving sweep shows throughput peaks at b8 and loses ~11% by b32
    (PERF.md); feeding large requests through b8 chunks keeps the compiled
    shape at the measured optimum while the double-buffered loop still
    overlaps chunk k+1's dispatch with chunk k's compute. ``names`` is the
    unpadded real-frame list, so trailing chunks may carry fewer (or zero)
    names — exactly the frames the caller gets back."""
    for names, imgs, gazes in batches:
        for j in range(0, len(imgs), micro):
            yield names[j : j + micro], imgs[j : j + micro], gazes[j : j + micro]


def _synthetic_batches(num_batches, canvas, batch, seed=304):
    import numpy as np

    rng = np.random.default_rng(seed)
    for i in range(num_batches):
        names = [f"synthetic_{i}_{j}" for j in range(batch)]
        yield (names, rng.uniform(0, 1, (batch, canvas, canvas, 3)).astype(np.float32),
               rng.uniform(0.2, 0.8, (batch, 2)).astype(np.float32))


def main(argv=None):
    parser = argparse.ArgumentParser(description="fovealseg-tpu serving")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--images", default=None, help="folder of frames")
    parser.add_argument("--gaze", default=None, help="json: name -> [fy, fx]")
    parser.add_argument("--out", default=None, help="write masks here")
    parser.add_argument("--png", action="store_true", help="also write palette previews")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--microbatch", type=int, default=0,
                        help="split each batch into chunks of this size through "
                             "the double-buffered loop (0 = auto: chunks of 8, "
                             "the measured-optimal serving micro-batch — the "
                             "b8->b32 sweep loses ~11%% fps monolithically; "
                             "pass --microbatch with --batch to disable: "
                             "--microbatch == --batch runs monolithic)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="shard each batch over N devices (0 = single device)")
    parser.add_argument("--spatial", type=int, default=0,
                        help="shard the conv trunk's image rows over N devices "
                             "(single-frame latency mode — use with --batch 1; "
                             "exclusive with --mesh)")
    parser.add_argument("--canvas", type=int, default=640)
    parser.add_argument("--num-batches", type=int, default=4, help="synthetic batches when --images absent")
    parser.add_argument("--torch-ckpt", default=None)
    parser.add_argument("--torch-epoch", default="last")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

    cfg = get_default_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    from fovealseg_tpu.configs import setup_compile_cache

    setup_compile_cache(cfg)

    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else jnp.float32
    if cfg.TPU.quantize:
        assert cfg.TPU.quantize == "int8", f"unknown TPU.quantize {cfg.TPU.quantize!r}"
        from fovealseg_tpu.models.layers import set_quantization

        set_quantization(True)  # trace-time flag; inference-only W8A8
    if cfg.TPU.conv_pack:
        from fovealseg_tpu.models.layers import set_conv_packing

        set_conv_packing(True)  # trace-time flag; set before any jit below
    dcfg = DeformConfig.from_cfg(cfg)
    spatial_sh = smesh = None
    if args.spatial > 1:
        # spatial partitioning: split one frame's conv work over N chips
        # (parallel/mesh.py — at b1 there is no batch axis to split)
        if args.mesh > 1:
            raise SystemExit("--spatial and --mesh are exclusive")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fovealseg_tpu.parallel.mesh import make_mesh_spatial

        smesh = make_mesh_spatial(args.spatial)
        spatial_sh = NamedSharding(smesh, P(None, "spatial"))
    module = DeformSegmentation(config=dcfg, dtype=dtype, spatial_sharding=spatial_sh)

    # micro-batching: requests larger than the measured-optimal micro-batch
    # run as chunks (auto: 8); monolithic fallback when the batch does not
    # divide evenly (or a chunk would not divide over --mesh). Decided
    # BEFORE init so param init and the quantization probe trace at the
    # micro shape — params are batch-independent, and a b32 640px init
    # would OOM the 16G HBM before the serving loop ever chunked it.
    micro = args.microbatch or min(args.batch, 8)
    if micro > args.batch or args.batch % micro or (args.mesh > 1 and micro % args.mesh):
        micro = args.batch

    x0 = jnp.zeros((micro, args.canvas, args.canvas, 3), jnp.float32)
    f0 = jnp.full((micro, 2), 0.5, jnp.float32)
    # jitted init: eager op-by-op init materializes every forward
    # intermediate concurrently under async dispatch and can exhaust HBM at
    # the flagship 640px shapes; one compiled program has proper liveness
    variables = jax.jit(module.init)(
        {"params": jax.random.PRNGKey(cfg.TRAIN.seed)}, x0, f0
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    if args.torch_ckpt:
        from fovealseg_tpu.train.checkpoint import load_torch_checkpoint

        params, stats = load_torch_checkpoint(
            args.torch_ckpt, args.torch_epoch, params, stats
        )

    quant = None
    if cfg.TPU.quantize:
        # hoist weight quantization out of the serving loop (the in-graph
        # max/round over all conv weights would otherwise re-run per batch);
        # restricted to the scopes this model's int8 path actually reads
        from fovealseg_tpu.models.layers import quantize_params, quantized_kernel_paths

        paths = quantized_kernel_paths(
            module, {"params": params, "batch_stats": stats}, x0, f0,
            argmax_labels=True, method=DeformSegmentation.infer,
        )
        quant = quantize_params(params, paths)

    def serve_fn(params, stats, x, f):
        variables = {"params": params, "batch_stats": stats}
        if quant is not None:
            variables["quant"] = quant
        out = module.apply(
            variables, x, f,
            argmax_labels=True, method=DeformSegmentation.infer,
        )
        return out["pred_label"]

    if args.mesh > 1:
        # batch-sharded GSPMD serving: params replicated, batch split over
        # the data axis; XLA inserts the collectives (none are needed — the
        # pipeline is batch-elementwise, so this is embarrassingly parallel
        # scale-out across chips)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fovealseg_tpu.parallel.mesh import make_mesh

        if args.batch % args.mesh:
            raise SystemExit("--batch must be divisible by --mesh")
        mesh = make_mesh(args.mesh)
        repl = NamedSharding(mesh, P())
        split = NamedSharding(mesh, P("data"))
        serve = jax.jit(
            serve_fn,
            in_shardings=(repl, repl, split, split),
            out_shardings=split,
        )
    elif args.spatial > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(smesh, P())
        serve = jax.jit(serve_fn, in_shardings=(rep,) * 4, out_shardings=rep)
    else:
        serve = jax.jit(serve_fn)

    if args.images:
        gaze_map = {}
        if args.gaze:
            with open(args.gaze) as fh:
                gaze_map = json.load(fh)
        batches = _iter_image_batches(args.images, gaze_map, args.canvas, args.batch)
    else:
        batches = _synthetic_batches(args.num_batches, args.canvas, args.batch)

    if micro != args.batch:
        batches = _microbatches(batches, micro)

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    # double-buffer: enqueue batch k+1 while batch k computes; the first
    # batch pays the compile and is excluded from the throughput window
    n_frames = 0
    pending = None  # (names, device result, timed)
    t0 = None
    for names, imgs, gazes in batches:
        label = serve(params, stats, jnp.asarray(imgs), jnp.asarray(gazes))
        timed = t0 is not None
        if t0 is None:
            label.block_until_ready()
            t0 = time.perf_counter()
        if pending is not None:
            _drain(pending[:2], args)
            n_frames += len(pending[0]) if pending[2] else 0
        pending = (names, label, timed)
    if pending is not None:
        _drain(pending[:2], args)
        n_frames += len(pending[0]) if pending[2] else 0
    dt = max(time.perf_counter() - (t0 or time.perf_counter()), 1e-9)

    print(json.dumps({
        "frames": n_frames,
        "seconds": round(dt, 3),
        "fps": round(n_frames / dt, 2),
        "canvas": args.canvas,
        "batch": args.batch,
        "microbatch": micro,
        "task": list(dcfg.task_hw_infer),
        "note": "post-compile wall clock incl. host IO; bench.py reports the device-only rate",
    }))


def _drain(pending, args):
    import numpy as np

    names, label = pending
    masks = np.asarray(label, np.uint8)
    if not args.out:
        return
    for n, m in zip(names, masks):
        stem = os.path.splitext(os.path.basename(n))[0]
        np.save(os.path.join(args.out, stem + ".mask.npy"), m)
        if args.png:
            from PIL import Image

            from fovealseg_tpu.utils.visuals import rgb_img

            Image.fromarray(
                np.asarray(rgb_img(m, int(m.max()) + 1), np.uint8)
            ).save(os.path.join(args.out, stem + ".mask.png"))


if __name__ == "__main__":
    main()
