"""Host input pipeline benchmark (VERDICT r2 #4): does prefetch overlap?

Round 2 measured the production train step at 98.6 ms/b16 with
device-resident data, but never measured the host-fed path the CLI uses:
``data/loader.py::prefetch`` running host batch generation + host->device
copy in a background thread while the chip steps. This benchmark measures,
on the flagship config (640^2 canvas, b16, bf16):

  t_gen      host synthetic-batch generation (data/synthetic.py::make_batch)
  t_put      host->device transfer of one batch (+commit)
  t_step     device-resident train step (the chip-side floor)
  serial     loop of gen -> put -> step (no overlap)
  prefetched loop over prefetch(gen, transform=device_put) (the CLI's path)

and reports overlap_ratio = (serial - prefetched) / (serial - ideal), where
ideal = max(t_gen + t_put, t_step) is perfect overlap: 1.0 = the loader
hides the entire host side, 0.0 = fully serialized.

NOTE on this image: the TPU is behind a WAN tunnel, so t_put is hundreds of
times a PCIe/DMA-class copy and dominates both loops — the *ratio* is the
deliverable (the same harness on a directly-attached host measures the
production overlap). Steps are few (STEPS env, default 10) because each
tunnel copy costs seconds.
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
from fovealseg_tpu.data.loader import prefetch
from fovealseg_tpu.data.synthetic import make_batch
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

BATCH = int(os.environ.get("TRAIN_BATCH", "16"))
CANVAS = 640
STEPS = int(os.environ.get("STEPS", "10"))
NUM_FG = 50


def main():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = NUM_FG + 1
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
    step = jax.jit(make_train_step(module, tx, LossConfig.from_cfg(cfg)))
    drop_key = jax.random.key(1, impl=cfg.TPU.dropout_rng_impl)

    rng = np.random.default_rng(0)

    def gen():
        while True:
            yield make_batch(rng, BATCH, CANVAS, NUM_FG)

    def to_device(b):
        out = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
        for v in out.values():
            v.block_until_ready()
        return out

    g = gen()
    b0 = to_device(next(g))
    state = init_state(module, tx, jax.random.PRNGKey(0), b0)

    # warm the step executable
    state, mets = step(state, b0, drop_key)
    jax.block_until_ready(mets["loss"])

    # --- component timings ---
    t0 = time.perf_counter()
    host_batches = [next(g) for _ in range(3)]
    t_gen = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    dev = [to_device(hb) for hb in host_batches]
    t_put = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, mets = step(state, b0, drop_key)
    jax.block_until_ready(mets["loss"])
    t_step = (time.perf_counter() - t0) / STEPS

    # --- serial loop ---
    t0 = time.perf_counter()
    for _ in range(STEPS):
        b = to_device(next(g))
        state, mets = step(state, b, drop_key)
        jax.block_until_ready(mets["loss"])
    serial = (time.perf_counter() - t0) / STEPS

    # --- prefetched loop: transform=device_put in the worker thread ---
    def bounded():
        for _ in range(STEPS):
            yield next(g)

    t0 = time.perf_counter()
    for b in prefetch(bounded(), size=2, transform=to_device):
        state, mets = step(state, b, drop_key)
    jax.block_until_ready(mets["loss"])
    pre = (time.perf_counter() - t0) / STEPS

    # --- gen-only prefetch: host batch prep in the worker, device transfer
    # on the consumer side (no second thread issuing device RPCs — on a
    # single tunnel connection the interleaved RPCs head-of-line block) ---
    t0 = time.perf_counter()
    for b in prefetch(bounded(), size=2):
        state, mets = step(state, to_device(b), drop_key)
    jax.block_until_ready(mets["loss"])
    pre_gen = (time.perf_counter() - t0) / STEPS

    ideal = max(t_gen + t_put, t_step)
    denom = serial - ideal
    ratio = (serial - pre) / denom if denom > 1e-9 else 1.0
    res = {
        "batch": BATCH,
        "steps": STEPS,
        "t_gen_ms": round(t_gen * 1e3, 1),
        "t_put_ms": round(t_put * 1e3, 1),
        "t_step_ms": round(t_step * 1e3, 1),
        "serial_ms": round(serial * 1e3, 1),
        "prefetched_ms": round(pre * 1e3, 1),
        "prefetched_gen_only_ms": round(pre_gen * 1e3, 1),
        "ideal_ms": round(ideal * 1e3, 1),
        "overlap_ratio": round(float(np.clip(ratio, 0.0, 1.5)), 3),
        "overlap_ratio_gen_only": round(
            float(np.clip((serial - pre_gen) / denom if denom > 1e-9 else 1.0,
                          -0.5, 1.5)), 3),
        "samples_per_sec_best": round(BATCH / min(pre, pre_gen, serial), 2),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
