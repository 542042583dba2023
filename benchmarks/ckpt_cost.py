"""Per-epoch checkpoint cost at flagship scale: sync vs async (verdict r3 #4).

The sync path is what the loop did through round 3: full ``jax.device_get``
of the TrainState (params + batch_stats + adam mu/nu, ~1.6 GB f32 at 130M
params) followed by a synchronous orbax save — the train loop stalls for the
whole thing, and on this image's WAN TPU tunnel the device_get alone is
~100 s/1.6 GB. The async path (TPU.async_checkpoint, train/checkpoint.py::
AsyncSaver) blocks only for orbax's device->host snapshot and writes in a
background thread.

Reports, per path: blocking seconds seen by the train loop, and total
seconds until the checkpoint is durable. Run on the TPU:
    python benchmarks/ckpt_cost.py [SAVE_DIR=/tmp/ckpt_cost]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fovealseg_tpu.configs import get_default_cfg
from fovealseg_tpu.data.synthetic import make_batch_device
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.train import checkpoint as ckpt
from fovealseg_tpu.train.optim import create_optimizer
from fovealseg_tpu.train.step import init_state


def main():
    save_dir = os.environ.get("SAVE_DIR", "/tmp/ckpt_cost")
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

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc, dtype=jnp.bfloat16)
    tx = create_optimizer(cfg)
    sample = jax.device_get(make_batch_device(jax.random.PRNGKey(0), 2, 640, 50))
    state = init_state(module, tx, jax.random.PRNGKey(0), sample)
    nbytes = sum(l.nbytes for l in jax.tree.leaves(state)) / 2**30
    print(f"flagship TrainState: {nbytes:.2f} GiB", flush=True)

    res = {"state_GiB": round(nbytes, 2)}

    # Both paths measured at the loop's REAL on-cadence behavior: one epoch
    # writes BOTH epoch_N and epoch_last (train_deform_semantic.py:166-208
    # semantics). Sync writes twice after one device_get; async snapshots
    # once, backgrounds the write, and mirrors epoch_last by a deferred
    # host directory copy (AsyncSaver copy_to).
    d = os.path.join(save_dir, "sync")
    shutil.rmtree(d, ignore_errors=True)
    t0 = time.perf_counter()
    host_state = jax.device_get(state)
    t_get = time.perf_counter() - t0
    t0 = time.perf_counter()
    ckpt.save_checkpoint(d, 1, host_state)
    t_save = time.perf_counter() - t0
    res["sync"] = {
        "device_get_s": round(t_get, 1),
        "orbax_save_s": round(t_save, 1),
        "blocking_s": round(t_get + t_save, 1),
        "durable_s": round(t_get + t_save, 1),
    }
    print("sync:", res["sync"], flush=True)

    # --- async path (TPU.async_checkpoint) ---
    d = os.path.join(save_dir, "async")
    shutil.rmtree(d, ignore_errors=True)
    saver = ckpt.AsyncSaver()
    try:
        t0 = time.perf_counter()
        ckpt.save_checkpoint(d, 1, state, saver=saver)
        t_block = time.perf_counter() - t0  # what the train loop waits
        saver.wait()  # background write + epoch_last mirror copy
        t_total = time.perf_counter() - t0
    finally:
        saver.close()
    res["async"] = {
        "blocking_s": round(t_block, 1),
        "durable_s": round(t_total, 1),
    }
    print("async:", res["async"], flush=True)
    res["speedup_blocking"] = round(
        res["sync"]["blocking_s"] / max(res["async"]["blocking_s"], 1e-9), 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
