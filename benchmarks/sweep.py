"""On-chip perf sweep: inference fps vs batch size + full-res infer timing.

Timing: RTT-corrected differential chaining (benchmarks/timing.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation


def flagship(dtype=jnp.bfloat16):
    cfg = DeformConfig(
        task_hw=(80, 80), task_hw_infer=(80, 80), saliency_hw=(80, 80),
        gaussian_radius=45, num_class=51, arch_encoder="hrnetv2_nodownsp",
    )
    return DeformSegmentation(config=cfg, dtype=dtype)


def time_chained(apply_fn, variables, x, f, n1=5, n2=25):
    from benchmarks.timing import time_op

    return time_op(lambda x: apply_fn(variables, x, f), x, n1=n1, n2=n2)


def main():
    module = flagship()
    results = {}
    for batch in (1, 8, 32):
        x = jnp.zeros((batch, 640, 640, 3), jnp.float32)
        f = jnp.full((batch, 2), 0.5, jnp.float32)
        shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
        variables = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

        dt = time_chained(
            lambda v, x, f: module.apply(v, x, f, train=False)["pred"], variables, x, f
        )
        results[f"infer_b{batch}"] = dict(ms=dt * 1e3, fps=batch / dt)
        print(f"batch {batch}: warped-domain {dt*1e3:.2f} ms -> {batch/dt:.1f} fps", flush=True)

        dti = time_chained(
            lambda v, x, f: module.apply(v, x, f, method=DeformSegmentation.infer)["pred_sampled"],
            variables, x, f, n1=3, n2=13,
        )
        results[f"fullres_b{batch}"] = dict(ms=dti * 1e3, fps=batch / dti)
        print(f"  full-res inverse-warp {dti*1e3:.2f} ms -> {batch/dti:.1f} fps", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
