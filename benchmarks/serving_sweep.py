"""Serving-path sweep: full-res argmax inference latency/throughput vs batch
size (SLO view: batch-1 latency up to batch-32 throughput) and per-encoder
serving rates. Timing: RTT-corrected differential chaining
(benchmarks/timing.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.timing import time_op
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation


def build(arch="hrnetv2_nodownsp", fc_dim=960, task_infer=80):
    cfg = DeformConfig(
        task_hw=(80, 80), task_hw_infer=(task_infer, task_infer),
        saliency_hw=(80, 80),
        gaussian_radius=45, num_class=51, arch_encoder=arch, fc_dim=fc_dim,
    )
    return DeformSegmentation(config=cfg, dtype=jnp.bfloat16)


def _setup(module, batch):
    x = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    f = jnp.full((batch, 2), 0.5, jnp.float32)
    shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
    variables = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    return variables, x, f


def measure_serving(module, batch):
    variables, x, f = _setup(module, batch)
    dt = time_op(
        lambda x: module.apply(
            variables, x, f, argmax_labels=True, method=DeformSegmentation.infer
        )["pred_label"],
        x, n1=5, n2=25,
    )
    return dt


def measure_serving_micro(module, batch, micro=8):
    """The cli/infer.py micro-batched path: a ``batch``-frame request served
    as ``batch//micro`` chunked executions at the measured-optimal micro
    shape (chunks serialized inside one program — the device-side cost; the
    serving loop's double-buffering hides the per-chunk dispatch)."""
    variables, x, f = _setup(module, batch)

    def fn(x):
        outs = [
            module.apply(
                variables, x[j : j + micro], f[j : j + micro],
                argmax_labels=True, method=DeformSegmentation.infer,
            )["pred_label"]
            for j in range(0, batch, micro)
        ]
        return jnp.concatenate(outs)

    return time_op(fn, x, n1=5, n2=25)


def memory_analysis(module, batch):
    """XLA compile-time memory breakdown of the serving executable — the
    evidence for/against the VMEM-working-set hypothesis behind the b8->b32
    throughput falloff (round-3 verdict weak #4)."""
    variables, x, f = _setup(module, batch)
    compiled = jax.jit(
        lambda x: module.apply(
            variables, x, f, argmax_labels=True, method=DeformSegmentation.infer
        )["pred_label"]
    ).lower(x).compile()
    m = compiled.memory_analysis()
    if m is None:
        return None
    return {
        "temp_MB": round(m.temp_size_in_bytes / 2**20, 1),
        "argument_MB": round(m.argument_size_in_bytes / 2**20, 1),
        "output_MB": round(m.output_size_in_bytes / 2**20, 1),
        "peak_MB": round(
            getattr(m, "peak_memory_in_bytes", 0) / 2**20, 1
        ) if getattr(m, "peak_memory_in_bytes", None) else None,
    }


def main():
    out = {"batch_sweep": {}, "micro_batched": {}, "memory": {}, "encoders": {}}
    flagship = build()
    for b in (1, 2, 4, 8, 16, 32):
        dt = measure_serving(flagship, b)
        out["batch_sweep"][b] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "fps": round(b / dt, 1),
        }
        print(f"b{b}: {dt*1e3:.2f} ms, {b/dt:.1f} fps", flush=True)
    for b in (16, 32):
        dt = measure_serving_micro(flagship, b)
        out["micro_batched"][b] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "fps": round(b / dt, 1),
        }
        print(f"b{b} micro8: {dt*1e3:.2f} ms, {b/dt:.1f} fps", flush=True)
    for b in (8, 32):
        out["memory"][b] = memory_analysis(flagship, b)
        print(f"b{b} memory: {out['memory'][b]}", flush=True)
    # accuracy/throughput knob: inference grid at 128 (TRAIN.task_input_size
    # _eval) buys +0.042 fg IoU on the staged checkpoint (PERF.md residual
    # attribution) at (128/80)^2 = 2.56x task-domain encoder FLOPs
    dt = measure_serving(build(task_infer=128), 8)
    out["task_eval_128"] = {"ms_per_batch8": round(dt * 1e3, 2), "fps": round(8 / dt, 1)}
    print(f"task128 b8: {dt*1e3:.2f} ms, {8/dt:.1f} fps", flush=True)
    for arch, fc_dim in (
        ("segformer", 1024),
        ("deeplab", 960),
    ):
        dt = measure_serving(build(arch, fc_dim), 8)
        out["encoders"][arch] = {
            "ms_per_batch8": round(dt * 1e3, 2),
            "fps": round(8 / dt, 1),
        }
        print(f"{arch} b8: {dt*1e3:.2f} ms, {8/dt:.1f} fps", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
