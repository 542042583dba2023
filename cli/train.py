"""Training/eval CLI — surface parity with the reference driver.

Usage (same flags as /root/reference/train_deform_semantic.py:596-693):

  python cli/train.py --cfg fovealseg_tpu/configs/deform.yaml \
      TRAIN.task_input_size '(80,80)' DIR ./ckpt/lvis_50cls \
      TRAIN.deform_joint_loss True VAL.no_upsample True \
      MODEL.gaussian_radius 45 TRAIN.saliency_input_size '(80, 80)'

``--gpus`` is accepted for CLI parity but device selection is JAX's: all
local devices form the data-parallel mesh (the SPMD replacement for
mp.spawn + DDP at train_deform_semantic.py:689).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description="fovealseg-tpu training")
    parser.add_argument("--cfg", required=True, metavar="FILE")
    parser.add_argument("--gpus", default=None,
                        help="reference device grammar ('0-3', 'gpu0,gpu1'); "
                             "sizes the data mesh (first N local devices). "
                             "Default: all devices")
    parser.add_argument("--data", default="synthetic",
                        help="'synthetic', or path to a cooked data root "
                             "(with train/ and valid/ partition dirs)")
    parser.add_argument("--dataset", default="lvis", choices=["lvis", "cityscapes"],
                        help="cooked-data family under --data: 'lvis' (b2 grammar) or "
                             "'cityscapes' (b3 gaze-crop grammar; the reference's "
                             "PreprocessDataset supports both, dataset.py:45)")
    parser.add_argument("--image-root", default=None, help="COCO image dir for cooked LVIS data")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.parallel.mesh import (
        make_mesh,
        make_parallel_eval_step,
        make_parallel_train_step,
        replicate_state,
        shard_batch,
    )
    from fovealseg_tpu.train.loop import fit
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import LossConfig, init_state

    cfg = get_default_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    from fovealseg_tpu.configs import setup_compile_cache

    setup_compile_cache(cfg)

    # TPU.mesh_shape (dp, mp): two non-zero dims select the 2-D GSPMD mesh
    # (tensor-parallel wide conv weights over 'model', batch over 'data' —
    # parallel/mesh.py); anything else is the 1-D shard_map DP mesh (the
    # reference's DDP equivalent).
    mesh_shape = tuple(cfg.TPU.mesh_shape)
    use_2d = len(mesh_shape) == 2 and all(s > 0 for s in mesh_shape)
    # --gpus (reference grammar, utils.py:341-361) sizes the 1-D data mesh
    n_requested = None
    if args.gpus is not None and not use_2d:
        from fovealseg_tpu.utils.misc import parse_devices

        n_requested = min(len(parse_devices(args.gpus)), jax.device_count())
    # the device count the training mesh will actually have — auto-batch
    # accounting below must agree with it (the reference sizes both from
    # len(gpus), train_deform_semantic.py:630-635)
    n_mesh = (mesh_shape[0] * mesh_shape[1]) if use_2d \
        else (n_requested or jax.device_count())

    if cfg.TRAIN.auto_batch == "auto10":
        # reference auto-batch heuristic (train_deform_semantic.py:627-635):
        # ~0.65M pixels per device with hrnetv2, epoch_iters = one data pass
        cfg.TRAIN.batch_size_per_gpu = max(1, int(
            (1e6 * 0.65) // (cfg.DATASET.imgSizes[0] * cfg.DATASET.imgSizes[0])
        ))
        cfg.TRAIN.num_gpus = n_mesh
        if os.path.isfile(cfg.DATASET.list_train):
            with open(cfg.DATASET.list_train) as fh:
                num_data = sum(1 for _ in fh)
            cfg.TRAIN.epoch_iters = max(1, int(
                num_data // (n_mesh * cfg.TRAIN.batch_size_per_gpu)
            ))
    cfg.TRAIN.max_iters = cfg.TRAIN.epoch_iters * cfg.TRAIN.num_epoch

    os.makedirs(cfg.DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(cfg.DIR, "train.log")),
        ],
    )
    log = logging.getLogger("fovealseg")
    log.info("config:\n%s", cfg.dump())
    from fovealseg_tpu.configs import audit_dead_keys

    audit_dead_keys(cfg, log)

    if use_2d:
        from fovealseg_tpu.parallel.mesh import make_mesh_2d

        mesh = make_mesh_2d(dp=mesh_shape[0], mp=mesh_shape[1])
    else:
        mesh = make_mesh(n_requested)
    n_dev = mesh.devices.size
    axis = cfg.TPU.data_axis
    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else jnp.float32

    dc = DeformConfig.from_cfg(cfg)
    # GSPMD reductions are global, so the 2-D path needs no BN axis_name
    sync_axis = axis if (cfg.TPU.sync_bn and n_dev > 1 and not use_2d) else None
    module = DeformSegmentation(config=dc, axis_name=sync_axis, dtype=dtype)
    init_module = DeformSegmentation(config=dc, dtype=dtype)
    lcfg = LossConfig.from_cfg(cfg)

    batch_size = cfg.TRAIN.batch_size_per_gpu * n_dev
    rng_np = np.random.default_rng(cfg.TRAIN.seed)

    if args.data == "synthetic":
        from fovealseg_tpu.data.synthetic import make_batch

        def train_loader(epoch):
            for _ in range(cfg.TRAIN.epoch_iters):
                yield shard_batch(make_batch(rng_np, batch_size), mesh, axis)

        def val_loader():
            # a FIXED held-out stream, independent of the training rng: eval
            # epochs score the same data (epoch-to-epoch deltas are signal,
            # not sampling noise) and eval cadence/visual dumps cannot shift
            # the training data sequence
            val_rng = np.random.default_rng(cfg.TRAIN.seed + 10_000)
            for _ in range(8):
                yield shard_batch(make_batch(val_rng, batch_size), mesh, axis)

    elif args.dataset == "cityscapes":
        # cooked b3 gaze-crop samples (the reference's PreprocessDataset
        # consumes both families, DynamicFocus/e_preprocess_scripts/
        # dataset.py:45; its shipped driver hardcodes 'lvis' at
        # train_deform_semantic.py:461 — here both are first-class)
        from fovealseg_tpu.data.cityscapes import DatasetCityscapes

        train_ds = DatasetCityscapes(os.path.join(args.data, "train"),
                                     marker=cfg.DATASET.dataset_marker_train)
        val_ds = DatasetCityscapes(os.path.join(args.data, "valid"),
                                   marker=cfg.DATASET.dataset_marker_valid)
        log.info("Cityscapes cooked data: %d train / %d val",
                 len(train_ds), len(val_ds))
    else:
        from fovealseg_tpu.data.lvis import DatasetLVIS

        train_ds = DatasetLVIS(os.path.join(args.data, "train"), args.image_root,
                               marker=cfg.DATASET.dataset_marker_train)
        val_ds = DatasetLVIS(os.path.join(args.data, "valid"), args.image_root,
                             marker=cfg.DATASET.dataset_marker_valid)
        log.info("LVIS cooked data: %d train / %d val", len(train_ds), len(val_ds))

    if args.data != "synthetic":
        # the reference's epoch is exactly one loader pass and epoch_iters
        # is the schedule unit assumed equal to it (train():74 iterates the
        # DataLoader to exhaustion; cur_iter = i + (epoch-1)*epoch_iters) —
        # reconcile them or the staged LR decay and auto-resume's
        # step//epoch_iters epoch accounting silently desync
        steps_per_epoch = len(train_ds) // max(batch_size, 1)
        if steps_per_epoch == 0 or len(val_ds) < batch_size:
            raise SystemExit(
                f"cooked set too small for the global batch: "
                f"{len(train_ds)} train / {len(val_ds)} val samples but "
                f"batch_size_per_gpu={cfg.TRAIN.batch_size_per_gpu} x "
                f"{n_dev} devices = {batch_size}; reduce the batch or the "
                f"device count (--gpus)")
        if steps_per_epoch != cfg.TRAIN.epoch_iters:
            log.warning(
                "TRAIN.epoch_iters=%d but the cooked train set yields %d "
                "batches/epoch — using %d so the LR schedule and resume "
                "accounting stay in step (reference convention: "
                "epoch_iters == one dataset pass)",
                cfg.TRAIN.epoch_iters, steps_per_epoch, steps_per_epoch,
            )
            cfg.TRAIN.epoch_iters = steps_per_epoch
            cfg.TRAIN.max_iters = cfg.TRAIN.epoch_iters * cfg.TRAIN.num_epoch

        def train_loader(epoch):
            for b in train_ds.batches(batch_size, shuffle=True, seed=cfg.TRAIN.seed + epoch):
                yield shard_batch(b, mesh, axis)

        def val_loader():
            for b in val_ds.batches(batch_size, shuffle=False):
                yield shard_batch(b, mesh, axis)

    # build the optimizer only AFTER the epoch_iters reconciliation above:
    # make_stage_schedules closes over cfg.TRAIN.epoch_iters, so creating it
    # earlier would bake the stale value into the decade-decay boundaries
    tx = create_optimizer(cfg)
    sample = next(iter(val_loader()))
    state = init_state(init_module, tx, jax.random.PRNGKey(cfg.TRAIN.seed), sample)
    from fovealseg_tpu.utils.summary import summarize

    log.info("model summary:\n%s", summarize(state.params, state.batch_stats))

    # MODEL.weights_* per-net torch imports (ModelBuilder strict=False
    # loads, models/models.py:1174-1230; resume rewrites these paths at
    # train_deform_semantic.py:649-658)
    w_paths = {
        "encoder": cfg.MODEL.weights_encoder,
        "decoder": cfg.MODEL.weights_decoder,
        "saliency": cfg.MODEL.weights_net_saliency,
        "compress": cfg.MODEL.weights_net_compress,
    }
    if any(w_paths.values()):
        from fovealseg_tpu.train.checkpoint import load_torch_weight_files
        from fovealseg_tpu.train.step import TrainState

        p2, s2 = load_torch_weight_files(w_paths, state.params, state.batch_stats)
        state = TrainState(p2, s2, state.opt_state, state.step)
        log.info("loaded torch weights: %s",
                 {k: v for k, v in w_paths.items() if v})

    if use_2d:
        from fovealseg_tpu.parallel.mesh import shard_state_2d

        state = shard_state_2d(state, mesh)
        log.info("2-D mesh: dp=%d x mp=%d (tensor-parallel wide weights)",
                 mesh_shape[0], mesh_shape[1])
    else:
        state = replicate_state(state, mesh)

    # resume (TRAIN.start_epoch, train_deform_semantic.py:649-658);
    # TRAIN.auto_resume additionally restarts from epoch_last when the run
    # dir already holds one (preemption-safe restart — beyond-reference)
    restored = None
    if (cfg.TRAIN.start_epoch == 0 and cfg.TRAIN.auto_resume
            and os.path.isdir(os.path.join(cfg.DIR, "epoch_last"))):
        from fovealseg_tpu.train import checkpoint as ckpt

        restored = ckpt.load_checkpoint(cfg.DIR, "last", state)
        cfg.TRAIN.start_epoch = int(
            np.asarray(restored["step"]) // max(cfg.TRAIN.epoch_iters, 1)
        )
        # The AsyncSaver mirrors epoch_last by a DEFERRED directory copy
        # (drained at the next save), so a crash between epoch_N's durable
        # orbax write and that drain leaves epoch_last one save stale.
        # Recover the newer work: if a numbered epoch_* directory beats the
        # epoch epoch_last maps to, restore from it instead.
        numbered = []
        for d in os.listdir(cfg.DIR):
            if d.startswith("epoch_") and d[6:].isdigit() and os.path.isdir(
                    os.path.join(cfg.DIR, d)):
                numbered.append(int(d[6:]))
        if numbered and max(numbered) > cfg.TRAIN.start_epoch:
            try:
                newer = ckpt.load_checkpoint(cfg.DIR, max(numbered), state)
                restored = newer
                cfg.TRAIN.start_epoch = int(
                    np.asarray(restored["step"]) // max(cfg.TRAIN.epoch_iters, 1)
                )
                log.info("auto-resume: epoch_%d is newer than epoch_last, "
                         "using it", max(numbered))
            except Exception as e:  # partial/corrupt write: keep epoch_last
                log.warning("auto-resume: epoch_%d unreadable (%s), "
                            "keeping epoch_last", max(numbered), e)
        log.info("auto-resume: start_epoch=%d", cfg.TRAIN.start_epoch)
    # install the restored state whenever a checkpoint was loaded — an
    # auto-resume whose step maps to epoch 0 (loader shorter than
    # epoch_iters) must still keep the restored weights, not re-init
    if cfg.TRAIN.start_epoch > 0 or restored is not None:
        from fovealseg_tpu.train import checkpoint as ckpt

        epoch = cfg.TRAIN.start_epoch
        name = epoch if os.path.exists(os.path.join(cfg.DIR, f"epoch_{epoch}")) else "last"
        if restored is None:
            restored = ckpt.load_checkpoint(cfg.DIR, name, state)
        from fovealseg_tpu.train.step import TrainState

        restored_state = TrainState(
            restored["params"], restored["batch_stats"], restored["opt_state"], restored["step"]
        )
        if use_2d:
            from fovealseg_tpu.parallel.mesh import shard_state_2d

            state = shard_state_2d(restored_state, mesh)
        else:
            state = replicate_state(restored_state, mesh)
        log.info("resumed from %s at epoch %d", cfg.DIR, epoch)

    if use_2d:
        from fovealseg_tpu.parallel.mesh import make_gspmd_eval_step, make_gspmd_train_step

        train_step = make_gspmd_train_step(module, tx, lcfg, mesh, state,
                                           fix_bn=cfg.TRAIN.fix_bn)
        eval_step = make_gspmd_eval_step(module, lcfg, mesh, state)
    else:
        train_step = make_parallel_train_step(module, tx, lcfg, mesh, axis,
                                              fix_bn=cfg.TRAIN.fix_bn)
        eval_step = make_parallel_eval_step(module, lcfg, mesh, axis)

    if cfg.MODEL.gt_gradient and cfg.MODEL.gt_gradient_intrinsic_only:
        # intrinsic-only study: forward + metrics, NO backward/step
        # (train_deform_semantic.py:113 skips loss.backward entirely) — a
        # dedicated forward-only jitted step; running the grad step and
        # discarding its update would pay ~3x for nothing. BN running stats
        # still update (the reference's train-mode forward does too).
        from fovealseg_tpu.train.step import TrainState, compute_losses

        @jax.jit
        def train_step(state, batch, rng):  # noqa: F811
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            y = batch["seg_label"] if dc.gt_gradient else None
            if cfg.TRAIN.fix_bn:
                # the reference's eval-mode forward under fix_bn
                # (train_deform_semantic.py:69): frozen BN stats, no dropout
                out = init_module.apply(
                    variables, batch["img_data"], batch["focus_point"],
                    train=False, y=y, pool_s=batch.get("pool_s"),
                )
                new_stats = state.batch_stats
            else:
                out, mut = init_module.apply(
                    variables, batch["img_data"], batch["focus_point"], train=True,
                    y=y, pool_s=batch.get("pool_s"),
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
                new_stats = mut["batch_stats"]
            _, mets = compute_losses(out, batch, lcfg)
            return TrainState(state.params, new_stats, state.opt_state,
                              state.step + 1), mets

        log.info("gt_gradient_intrinsic_only: optimizer updates disabled")

    def visual_fn(state, epoch):
        # reference cadence dump set: {DIR}/train_visual_epoch{N}/iter0_batch{i}_*
        # (models/models.py:973-1039); uses one val batch on the unsharded module
        from fovealseg_tpu.utils.visuals import collect_deform_visuals, dump_batch_visuals

        batch = next(iter(val_loader()))
        host_batch = {k: np.asarray(v) for k, v in batch.items() if hasattr(v, "shape")}
        variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        vis = collect_deform_visuals(init_module, variables, host_batch, cfg.DATASET.num_class)
        save_dir = os.path.join(cfg.DIR, f"train_visual_epoch{epoch}")
        paths = dump_batch_visuals(save_dir, vis, num_classes=cfg.DATASET.num_class)
        log.info("wrote %d train visuals to %s", len(paths), save_dir)

    state = fit(cfg, state, train_step, eval_step, train_loader, val_loader,
                visual_fn=visual_fn if cfg.TRAIN.train_eval_visualise else None)
    log.info("Training Done!")
    return state


if __name__ == "__main__":
    main()
