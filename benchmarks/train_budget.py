"""Stage-level budget of the flagship TRAINING step (RTT-corrected).

PERF.md carries a component budget for the inference path; this produces the
same for training: where do the ~6.2 ms/step (b16, bf16) go?

  full step  = forward(+loss) + backward + 4-group torch-Adam update
  datagen    = on-device synthetic batch generation (the convergence-run path)

Methodology (see benchmarks/timing.py): every number is a two-point
differential — the same chained program at two iteration counts, report
(t2-t1)/(n2-n1) — because this image's TPU tunnel adds a ~30 ms fixed cost
per host-visible call and does not honor block_until_ready. The full step is
chained by its own state-carry (scan of real steps, as in train_dtype.py);
forward-only and forward+backward are chained via timing.time_op's
carry-into-first-arg trick so XLA cannot hoist the loop-invariant body.

Usage: python benchmarks/train_budget.py   (prints one JSON line)
Env: TRAIN_BATCH (default 16), DTYPE (bfloat16|float32, default bfloat16).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.timing import time_op
from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch, make_batch_device
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

BATCH = int(os.environ.get("TRAIN_BATCH", "16"))
DTYPE = os.environ.get("DTYPE", "bfloat16")


def main():
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
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc, dtype=dtype)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, batch=BATCH, canvas=640).items()}
    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(module, tx, lcfg)
    drop_key = jax.random.key(1, impl=cfg.TPU.dropout_rng_impl)

    # --- full step: scan of real steps, state carry serializes iterations ---
    def n_steps(state, n):
        def body(st, i):
            st, mets = step(st, batch, jax.random.fold_in(drop_key, i))
            return st, mets["loss"]

        return jax.lax.scan(body, state, jnp.arange(n))[1]

    run_a = jax.jit(lambda s: n_steps(s, 8))
    run_b = jax.jit(lambda s: n_steps(s, 48))
    np.asarray(run_a(state)); np.asarray(run_b(state))
    t0 = time.perf_counter(); np.asarray(run_a(state)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(run_b(state)); tb = time.perf_counter() - t0
    step_full = (tb - ta) / 40.0

    # --- forward(+loss) only, train-mode (BN stats mutated, dropout on) ---
    def fwd_loss(img, params, stats):
        out, _ = module.apply(
            {"params": params, "batch_stats": stats},
            img, batch["focus_point"], train=True,
            rngs={"dropout": drop_key}, mutable=["batch_stats"],
        )
        from fovealseg_tpu.train.step import compute_losses

        loss, _ = compute_losses(out, batch, lcfg)
        return loss

    t_fwd = time_op(fwd_loss, batch["img_data"], state.params, state.batch_stats,
                    n1=8, n2=48)

    # --- forward + backward (full grad tree reduced to one scalar) ---
    def fwd_bwd(img, params, stats):
        def lf(p):
            return fwd_loss(img, p, stats)

        loss, grads = jax.value_and_grad(lf)(params)
        gsum = sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(grads))
        return loss + gsum * 0.0

    t_fb = time_op(fwd_bwd, batch["img_data"], state.params, state.batch_stats,
                   n1=8, n2=48)

    # --- on-device synthetic datagen (the convergence-run input path) ---
    def datagen(i):
        b = make_batch_device(jax.random.fold_in(jax.random.PRNGKey(7), i), BATCH, 640, 50)
        return sum(jnp.sum(v).astype(jnp.float32) for v in jax.tree.leaves(b))

    t_gen = time_op(datagen, jnp.int32(0), n1=8, n2=48)

    res = {
        "batch": BATCH,
        "dtype": DTYPE,
        "ms_full_step": round(step_full * 1e3, 3),
        "ms_forward_loss": round(t_fwd * 1e3, 3),
        "ms_backward": round((t_fb - t_fwd) * 1e3, 3),
        "ms_optimizer_update": round((step_full - t_fb) * 1e3, 3),
        "ms_datagen_device": round(t_gen * 1e3, 3),
        "samples_per_sec": round(BATCH / step_full, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
