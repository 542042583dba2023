"""On-chip perf sweep: inference fps vs batch size, train-step time, and a
component breakdown (saliency+grid vs encoder+decoder)."""

import json
import os
import sys
import time

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


def timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    module = flagship()
    results = {}
    for batch in (1, 4, 8, 16, 32):
        x = jnp.zeros((batch, 640, 640, 3), jnp.float32)
        f = jnp.full((batch, 2), 0.5, jnp.float32)
        shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        fwd = jax.jit(lambda v, x, f: module.apply(v, x, f, train=False)["pred"])
        dt = timeit(fwd, variables, x, f)
        results[f"infer_b{batch}"] = dict(ms=dt * 1e3, fps=batch / dt)
        print(f"batch {batch}: {dt*1e3:.2f} ms -> {batch/dt:.1f} fps", flush=True)

        sal = jax.jit(lambda v, x, f: module.apply(v, x, f, method=DeformSegmentation.saliency))
        dts = timeit(sal, variables, x, f)
        results[f"saliency_b{batch}"] = dict(ms=dts * 1e3)
        print(f"  saliency+grid-prep only: {dts*1e3:.2f} ms", flush=True)

        infer = jax.jit(lambda v, x, f: module.apply(v, x, f, method=DeformSegmentation.infer)["pred_sampled"])
        dti = timeit(infer, variables, x, f, iters=10)
        results[f"fullres_infer_b{batch}"] = dict(ms=dti * 1e3, fps=batch / dti)
        print(f"  full-res inverse-warp infer: {dti*1e3:.2f} ms -> {batch/dti:.1f} fps", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
