"""Per-op microbenchmarks of the flagship's hot shapes vs the MXU roofline.

Times individual convs/resizes/gathers with the RTT-corrected differential
method (benchmarks/timing.py) to attribute the warped-domain budget found by
breakdown.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8


def time_fn(fn, *args, n1=20, n2=220):
    """RTT-corrected differential timing (benchmarks/timing.py)."""
    from benchmarks.timing import time_op

    return time_op(fn, *args, n1=n1, n2=n2)


def conv(x, w, stride=1, dilation=1, pad=None):
    k = w.shape[0]
    if pad is None:
        pad = dilation * (k // 2)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def main():
    key = jax.random.PRNGKey(0)
    results = {}

    def report(name, dt, flops=None):
        line = f"{name}: {dt*1e6:.1f} us"
        if flops:
            line += f"  ({flops/dt/1e12:.1f} TF/s)"
        results[name] = dt * 1e6
        print(line, flush=True)

    # --- conv shapes on the hot path (bf16) ---
    shapes = [
        ("enc 3x3 64->64 @80x80", (B, 80, 80, 64), (3, 3, 64, 64), 1, 1),
        ("enc 3x3 128->128 @40x40", (B, 40, 40, 128), (3, 3, 128, 128), 1, 1),
        ("enc 3x3 256->256 @20x20", (B, 20, 20, 256), (3, 3, 256, 256), 1, 1),
        ("enc 3x3 512->512 @10x10", (B, 10, 10, 512), (3, 3, 512, 512), 1, 1),
        ("c1 cbr 3x3 960->240 @80x80", (B, 80, 80, 960), (3, 3, 960, 240), 1, 1),
        ("cls 3x3 960->512 s4 @80x80", (B, 80, 80, 960), (3, 3, 960, 512), 4, 1),
        ("stem 3x3 3->64 @80x80", (B, 80, 80, 3), (3, 3, 3, 64), 1, 1),
        ("sal 3x3 5->24 @80x80", (B, 80, 80, 5), (3, 3, 5, 24), 1, 1),
        ("sal 3x3 24->24 @80x80", (B, 80, 80, 24), (3, 3, 24, 24), 1, 1),
    ]
    for name, xs, ws, stride, dil in shapes:
        x = jax.random.normal(key, xs, jnp.bfloat16)
        w = jax.random.normal(key, ws, jnp.bfloat16) * 0.05
        oh = xs[1] // stride
        flops = 2 * xs[0] * oh * oh * ws[0] * ws[1] * ws[2] * ws[3]
        dt = time_fn(lambda a, w=w, s=stride, d=dil: conv(a, w, s, d), x)
        report(name, dt, flops)

    # --- resizes / warp / softmax ---
    from fovealseg_tpu.core.interpolate import resize_bilinear
    from fovealseg_tpu.core.warp import grid_sample
    from fovealseg_tpu.core.gaze import focus_distance_map

    x640 = jax.random.normal(key, (B, 640, 640, 3), jnp.float32)
    dt = time_fn(lambda a: resize_bilinear(a, (80, 80)), x640)
    report("resize 640->80 (b8, 3ch, f32)", dt)
    x640b = x640.astype(jnp.bfloat16)
    dt = time_fn(lambda a: resize_bilinear(a, (80, 80)), x640b)
    report("resize 640->80 (b8, 3ch, bf16)", dt)

    g = jnp.clip(jax.random.normal(key, (B, 80, 80, 2), jnp.float32) * 0.5, -1, 1)
    dt = time_fn(lambda a, g=g: grid_sample(a, g), x640)
    report("grid_sample warp 640->80 (b8)", dt)

    f = jnp.full((B, 2), 0.5, jnp.float32)
    dt = time_fn(lambda a: focus_distance_map(a, 80, 80), f)
    report("focus_distance_map 80x80", dt)

    xs = jax.random.normal(key, (B, 80, 80, 1), jnp.float32)
    dt = time_fn(lambda a: jax.nn.softmax(a.reshape(B, -1), axis=-1).reshape(a.shape), xs)
    report("softmax 6400 (b8)", dt)

    # --- grid solver ---
    from fovealseg_tpu.models.deform_module import DeformConfig

    cfg = DeformConfig(task_hw=(80, 80), task_hw_infer=(80, 80), saliency_hw=(80, 80),
                       gaussian_radius=45, num_class=51)
    solver = cfg.solver()
    from fovealseg_tpu.core.grid import pad_saliency

    def solve(xs):
        hm = pad_saliency(xs, solver.pad_x, solver.pad_y, "replication")
        return solver.create_grid(hm, (80, 80), (80, 80))[0]

    dt = time_fn(solve, xs)
    report("grid solver (pad+create_grid)", dt)

    # --- matmul roofline refresh ---
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    dt = time_fn(lambda m: m @ m, a, n1=10, n2=110)
    report("matmul 4096^3 bf16", dt, 2 * 4096**3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
