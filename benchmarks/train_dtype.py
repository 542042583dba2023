"""bf16-vs-f32 training validation on the real chip (VERDICT r1 item 4).

Runs the 60-step flagship overfit (PERF.md training-viability protocol) with
float32 and bfloat16 compute dtypes on one fixed synthetic batch and reports
(a) the loss curve of each, (b) train samples/sec (RTT-corrected), so the
TPU.compute_dtype default can be flipped on evidence.

Params/optimizer/losses stay float32 in both runs — ``dtype`` only selects
the conv/BN compute dtype (mixed precision), mirroring the inference bench.
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

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

BATCH = int(os.environ.get("TRAIN_BATCH", "16"))
STEPS = 60


def run(dtype_name: str):
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
    cfg.TRAIN.lr_encoder = 2e-5
    cfg.TRAIN.lr_decoder = 2e-5
    cfg.TRAIN.deform_joint_loss = True
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc, dtype=dtype)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)

    rng = np.random.default_rng(0)
    batch_np = make_batch(rng, batch=BATCH, canvas=640)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    state = init_state(module, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(module, tx, lcfg)

    base_key = jax.random.key(1, impl=cfg.TPU.dropout_rng_impl)

    def n_steps(state, n):
        def body(carry, i):
            st, _ = carry
            st, mets = step(st, batch, jax.random.fold_in(base_key, i))
            return (st, mets["loss"]), mets["loss"]

        (state, _), losses = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(n))
        return state, losses

    run10 = jax.jit(lambda s: n_steps(s, 10))
    run60 = jax.jit(lambda s: n_steps(s, STEPS))

    # loss curve (one compiled 60-step run)
    _, losses = run60(state)
    losses = np.asarray(losses)

    # timing: two-point differential over 10 vs 60 steps
    jax.block_until_ready(run10(state)[1])
    t0 = time.perf_counter(); np.asarray(run10(state)[1]); t10 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(run60(state)[1]); t60 = time.perf_counter() - t0
    per_step = (t60 - t10) / (STEPS - 10)
    return losses, per_step


def main():
    out = {}
    for name in ("float32", "bfloat16"):
        losses, per_step = run(name)
        out[name] = {
            "loss_steps": {str(i): float(losses[i]) for i in (0, 4, 9, 29, 59)},
            "ms_per_step": per_step * 1e3,
            "samples_per_sec": BATCH / per_step,
        }
        print(
            f"{name}: loss {losses[0]:.3f} -> {losses[9]:.3f}@10 -> {losses[59]:.3f}@60, "
            f"{per_step*1e3:.1f} ms/step, {BATCH/per_step:.1f} samples/s",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
