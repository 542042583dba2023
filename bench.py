"""Benchmark: foveated FULL-RES serving frames/sec/chip (640px in, 640px out).

Headline (``value``): the end-to-end serving path — gaze map -> saliency ->
grid solve -> foveated warp -> HRNetV2-nodownsp -> C1 -> argmax inverse warp
back to the full 640x640 canvas (the reference's actual product surface:
argmax(pred_sampled), models_instance.py:839-949) — bf16 compute / f32
params, batch 8. Secondary fields: the warped-domain forward (the
BASELINE eval config, VAL.no_upsample=True — stops before the inverse
warp), the full-res score-map path (all 51 channels inverse-warped), and
``single_stream_ms`` (batch-1 serving latency).

``vs_baseline``: headline serving fps over **5x the measured PyTorch-CPU
baseline** (benchmarks/torch_baseline.py) — i.e. vs_baseline >= 1.0 means
the BASELINE.md north-star (">=5x end-to-end foveated inference throughput
vs the PyTorch baseline") is met against the only torch hardware present.
For the honest read against the rig the reference actually used (2 GPUs),
see BASELINE.md's FLOPs-derived estimate: one v5e chip ~= the optimistic
2x4090 warped-domain bound (~530-1081 fps), and the reference's full-res
path is CPU-scipy-bound regardless of GPU.
Conservative: the torch baseline stops at the warped domain (it has no
inverse-warp stage), so it is compared against our LONGER pipeline. The
measured baseline fps is cached in BASELINE_MEASURED.json (delete to
re-measure) and reported alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")


def _flagship_setup(batch: int):
    import jax
    import jax.numpy as jnp

    # importing __graft_entry__ also installs the persistent compile cache;
    # its _flagship is the single source of the flagship config literal
    from __graft_entry__ import _flagship

    module = _flagship(dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    f = jnp.full((batch, 2), 0.5, jnp.float32)
    shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
    variables = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    return module, variables, x, f


def measure_jax_fps(batch: int = 8, setup=None) -> float:
    # NOTE: this image's TPU tunnel does not synchronize block_until_ready
    # and adds a ~30 ms fixed cost to every host-visible call, so executions
    # are chained inside a jitted fori_loop (scalar-carry serialized) and the
    # per-step time comes from the DIFFERENCE of two chain lengths — the
    # fixed cost cancels exactly (benchmarks/timing.py; round-1 divided the
    # total by N, inflating every number).
    from benchmarks.timing import time_op

    module, variables, x, f = setup or _flagship_setup(batch)
    dt = time_op(lambda x: module.apply(variables, x, f, train=False)["pred"],
                 x, n1=5, n2=25)
    return batch / dt


def get_torch_baseline_fps() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)["torch_cpu_fps"]
    try:
        from benchmarks.torch_baseline import measure_torch_cpu_fps

        fps = measure_torch_cpu_fps(batch=4, iters=3, warmup=1)
        with open(BASELINE_CACHE, "w") as fh:
            json.dump({"torch_cpu_fps": fps, "note": "TorchFSNet eval batch=4 CPU"}, fh)
        return fps
    except Exception:
        return float("nan")


def measure_fullres_fps(batch: int = 8, setup=None) -> float:
    """Full-resolution path: forward + inverse warp + hole fill to 640x640."""
    from benchmarks.timing import time_op
    from fovealseg_tpu.models.deform_module import DeformSegmentation

    module, variables, x, f = setup or _flagship_setup(batch)
    dt = time_op(
        lambda x: module.apply(variables, x, f, method=DeformSegmentation.infer)["pred_sampled"],
        x, n1=5, n2=25,
    )
    return batch / dt


def measure_fullres_labels_fps(batch: int = 8, setup=None) -> float:
    """Full-res serving path: forward + argmax-only inverse warp (gathers one
    int32 class channel — exact argmax of pred_sampled, the quantity every
    eval metric consumes)."""
    from benchmarks.timing import time_op
    from fovealseg_tpu.models.deform_module import DeformSegmentation

    module, variables, x, f = setup or _flagship_setup(batch)
    dt = time_op(
        lambda x: module.apply(
            variables, x, f, argmax_labels=True, method=DeformSegmentation.infer
        )["pred_label"],
        x, n1=5, n2=25,
    )
    return batch / dt


def measure_single_stream_ms(setup=None) -> float:
    """Batch-1 serving latency (ms) on the full-res argmax path."""
    from benchmarks.timing import time_op
    from fovealseg_tpu.models.deform_module import DeformSegmentation

    module, variables, x, f = setup or _flagship_setup(1)
    dt = time_op(
        lambda x: module.apply(
            variables, x, f, argmax_labels=True, method=DeformSegmentation.infer
        )["pred_label"],
        x, n1=5, n2=25,
    )
    return dt * 1e3


def measure_train_fps(batch: int = 16):
    """Flagship TRAINING-step throughput: samples/sec/chip and derived MFU.

    The full production step (forward + joint Dice+Focal+edge loss + backward
    + 4-group Adam, train-mode BN, rbg dropout — the reference's training hot
    loop, train_deform_semantic.py:62-123) at the flagship config, b16 bf16
    defaults. Chained as a state-carried ``lax.scan`` of real steps at two
    trip counts so the tunnel's fixed per-call cost cancels and nothing
    hoists (benchmarks/train_budget.py methodology). MFU comes from XLA's
    own cost model for the single-step program over the v5e bf16 peak
    (~197 TF/s); None when cost_analysis is unavailable on this backend.

    Returns (samples_per_sec, step_ms, mfu_or_None).
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.data.synthetic import make_batch
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (80, 80)
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.MODEL.gaussian_radius = 45
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True

    module = DeformSegmentation(config=DeformConfig.from_cfg(cfg), dtype=jnp.bfloat16)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)
    step = make_train_step(module, tx, lcfg)
    rng = np.random.default_rng(0)
    batch_d = {k: jnp.asarray(v) for k, v in make_batch(rng, batch=batch, canvas=640).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch_d)
    drop_key = jax.random.key(1, impl=cfg.TPU.dropout_rng_impl)

    def n_steps(state, n):
        def body(st, i):
            st, mets = step(st, batch_d, jax.random.fold_in(drop_key, i))
            return st, mets["loss"]

        return jax.lax.scan(body, state, jnp.arange(n))[1]

    run_a = jax.jit(lambda s: n_steps(s, 8))
    run_b = jax.jit(lambda s: n_steps(s, 48))
    np.asarray(run_a(state)); np.asarray(run_b(state))
    t0 = time.perf_counter(); np.asarray(run_a(state)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(run_b(state)); tb = time.perf_counter() - t0
    dt = (tb - ta) / 40.0

    mfu = None
    try:
        # numerator: cost-model FLOPs of the FORWARD+loss, x3 for the
        # backward (conv bwd ~ 2x fwd MACs). The cost model of the full
        # train step undercounts (measured 2.37 TF vs ~7.3 TF analytic at
        # b16), so the forward count — which matches the analytic 152.8
        # GF/frame — anchors the estimate; treat mfu as approximate.
        def fwd_loss(s):
            out, _ = module.apply(
                {"params": s.params, "batch_stats": s.batch_stats},
                batch_d["img_data"], batch_d["focus_point"], train=True,
                rngs={"dropout": drop_key}, mutable=["batch_stats"],
            )
            from fovealseg_tpu.train.step import compute_losses

            return compute_losses(out, batch_d, lcfg)[0]

        cost = jax.jit(fwd_loss).lower(state).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = 3.0 * flops / dt / 197e12  # v5e bf16 peak (PERF.md)
    except Exception:
        pass
    return batch / dt, dt * 1e3, mfu


def pallas_exactness_guard(setup) -> bool | None:
    """On-chip JFA kernel exactness check, run BEFORE timing (round-3 verdict
    weak #2: the Pallas kernels were only equivalence-tested in interpret mode
    on CPU; a Mosaic lowering regression on real hardware would silently
    corrupt the headline).

    On a real serving batch's hole mask (inverse_grid_index of the flagship
    grid at 640x640) asserts:
      - seed kernel vs the lax JFA chain: equal nearest-seed DISTANCE at every
        pixel (JFA tie-breaks may pick a different equidistant seed, so
        distance — not index — is the exact invariant);
      - payload kernel == seed kernel when the payload IS the flat index (the
        three Pallas modes share one candidate traversal, so the winning seed
        is identical; this pins the payload-routing path);
      - packed class kernel == seed kernel's payload mod 2**cls_bits (pins the
        pack/unpack path used by the argmax serving headline).
    Returns True when the check ran and passed, None off-TPU. Raises on
    mismatch — the bench must fail loudly, not report a corrupt number.
    """
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        return None
    from fovealseg_tpu.core.grid import inverse_grid_index
    from fovealseg_tpu.core.unwarp import nearest_seed_jfa
    from fovealseg_tpu.models.deform_module import DeformSegmentation
    from fovealseg_tpu.ops.pallas_jfa import (
        nearest_class_pallas,
        nearest_payload_pallas,
        nearest_seed_pallas,
    )

    module, variables, _, _ = setup
    b = 2
    key = jax.random.PRNGKey(304)
    x = jax.random.uniform(key, (b, 640, 640, 3), jnp.float32)
    f = jnp.full((b, 2), 0.4, jnp.float32)

    from fovealseg_tpu.core.unwarp import (
        _nearest_payload,
        halfpixel_avg,
        jfa_rounds_from_grid,
    )
    from fovealseg_tpu.ops.pallas_gather import windowed_row_gather

    @jax.jit
    def check(x, f):
        out = module.apply(variables, x, f, method=DeformSegmentation.infer)
        tidx_in, valid0 = inverse_grid_index(out["grid"], (640, 640))
        # windowed Pallas gather vs the XLA flat gather on the REAL
        # payload-JFA index field (the TPU.scoremap_gather="windowed" path)
        rounds = jfa_rounds_from_grid(out["grid"], (640, 640))
        tidx = _nearest_payload(valid0, tidx_in, None, rounds)
        p2 = halfpixel_avg(out["pred"].astype(jnp.float32))
        bsz, th, tw, c = p2.shape
        flat = p2.reshape(bsz * th * tw, c)
        off = jnp.arange(bsz, dtype=jnp.int32)[:, None] * (th * tw)
        ref_g = flat[(tidx.reshape(bsz, -1) + off).reshape(-1)].reshape(
            bsz, 640, 640, c
        )
        win_g = windowed_row_gather(p2.reshape(bsz, th * tw, c), tidx)
        gather_eq = jnp.all(win_g == ref_g)
        _, valid = inverse_grid_index(out["grid"], (640, 640))
        h, w = valid.shape[1], valid.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 2)
        pos_flat = rows * w + cols

        def d2(seed_flat):
            dy = seed_flat // w - rows
            dx = seed_flat % w - cols
            return dy * dy + dx * dx

        seeds_l = nearest_seed_jfa(valid)
        seeds_p = nearest_seed_pallas(valid)
        pay = nearest_payload_pallas(valid, pos_flat)
        cls_bits = 11
        cls = nearest_class_pallas(valid, pos_flat % (1 << cls_bits), cls_bits)
        # relative-offset packed payload kernel (the score path's production
        # variant for 13-bit task indices) — same candidate order/distances
        # as the seed kernel, so winners must be identical
        from fovealseg_tpu.ops.pallas_jfa import nearest_payload_packed_pallas

        relp = nearest_payload_packed_pallas(
            valid, pos_flat & 8191, 13, rounds=rounds
        )
        return (
            jnp.all(d2(seeds_p) == d2(seeds_l)),
            jnp.all(pay == seeds_p),
            jnp.all(cls == seeds_p % (1 << cls_bits)),
            gather_eq & jnp.all(relp == (seeds_p & 8191)),
        )

    seed_ok, pay_ok, cls_ok, gather_ok = (
        bool(v) for v in jax.device_get(check(x, f))
    )
    if not (seed_ok and pay_ok and cls_ok and gather_ok):
        raise AssertionError(
            f"on-TPU Pallas exactness guard FAILED: seed_dist_eq={seed_ok} "
            f"payload_eq={pay_ok} class_eq={cls_ok} windowed_gather_eq={gather_ok} "
            "— Mosaic lowering no longer matches the lax oracle; the "
            "headline would be corrupt."
        )
    return True


def main():
    setup = _flagship_setup(8)  # one model/param materialization for the b8 paths
    guard = pallas_exactness_guard(setup)
    serving = measure_fullres_labels_fps(setup=setup)
    warped = measure_jax_fps(setup=setup)
    scoremap = measure_fullres_fps(setup=setup)
    b1_ms = measure_single_stream_ms()
    train_fps, train_ms, train_mfu = measure_train_fps()
    base = get_torch_baseline_fps()
    vs = serving / (5.0 * base) if base == base and base > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "foveated_serving_throughput",
                "value": round(serving, 3),
                "unit": "frames/sec/chip (640px->80x80->640px argmax serving, FSNet HRNetV2 bf16, batch 8)",
                "vs_baseline": round(vs, 3),
                "single_stream_ms": round(b1_ms, 3),
                "warped_domain_fps": round(warped, 3),
                "fullres_scoremap_fps": round(scoremap, 3),
                "train_step_fps": round(train_fps, 3),
                "train_step_ms_b16": round(train_ms, 3),
                "train_mfu_est": round(train_mfu, 4) if train_mfu is not None else None,
                "torch_cpu_baseline_fps": round(base, 3) if base == base else None,
                "pallas_exactness_guard": guard,
                "baseline_definition": "5x torch-CPU pipeline (BASELINE.md north star; torch stops at the warped domain — compared against our longer full-res path)",
            }
        )
    )


if __name__ == "__main__":
    main()
