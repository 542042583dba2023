"""Component-level timing breakdown of the flagship warped-domain forward.

Times (fori_loop-chained, see sweep.py) each stage of the FSNet forward in
isolation on the real chip: saliency net, grid solver, forward warp, encoder,
decoder — to locate the MFU gap (VERDICT r1: ~65 TF/s vs 278 TF/s roofline).
"""

import json
import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.sweep import flagship, time_chained
from fovealseg_tpu.models.deform_module import DeformSegmentation

BATCH = int(os.environ.get("BREAKDOWN_BATCH", "8"))


def main():
    module = flagship()
    x = jnp.zeros((BATCH, 640, 640, 3), jnp.float32)
    f = jnp.full((BATCH, 2), 0.5, jnp.float32)
    shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
    variables = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    # stage inputs (computed once, correct shapes/dtypes)
    def upto_warp(v, x, f):
        xs = module.apply(v, x, f, method=DeformSegmentation.saliency)
        grid, _ = module.apply(v, xs, method=DeformSegmentation.grids)
        from fovealseg_tpu.core.warp import grid_sample

        return grid_sample(x, grid).astype(module.dtype)

    x_sampled = jax.jit(upto_warp)(variables, x, f)
    feat0 = jax.jit(
        lambda v, xs: module.apply(v, xs, method=lambda m, a: m.encoder(a, train=False))[0]
    )(variables, x_sampled)

    stages = {
        "full_forward": lambda v, a, b: module.apply(v, a, b, train=False)["pred"],
        "saliency": lambda v, a, b: module.apply(v, a, b, method=DeformSegmentation.saliency),
        "saliency_grid_warp": upto_warp,
    }
    results = {}
    for name, fn in stages.items():
        dt = time_chained(fn, variables, x, f)
        results[name] = dt * 1e3
        print(f"{name}: {dt*1e3:.2f} ms/batch{BATCH}", flush=True)

    # encoder / decoder take different inputs
    def enc_fn(v, a, b):
        return module.apply(v, a, method=lambda m, t: m.encoder(t, train=False))[0]

    def dec_fn(v, a, b):
        return module.apply(v, a, method=lambda m, t: m.decoder([t], train=False))

    dt = time_chained(enc_fn, variables, x_sampled, f)
    results["encoder"] = dt * 1e3
    print(f"encoder: {dt*1e3:.2f} ms/batch{BATCH}", flush=True)
    dt = time_chained(dec_fn, variables, feat0, f)
    results["decoder"] = dt * 1e3
    print(f"decoder: {dt*1e3:.2f} ms/batch{BATCH}", flush=True)

    # --- serving unwarp stages (the argmax inverse-warp tail) ---
    from fovealseg_tpu.core.grid import landing_scatter_max
    from fovealseg_tpu.core.unwarp import (
        _nearest_payload,
        halfpixel_avg,
        jfa_rounds_from_grid,
        unwarp_argmax_scatter,
    )

    seg_hw = (640, 640)

    def upto_pred(v, x, f):
        xs = module.apply(v, x, f, method=DeformSegmentation.saliency)
        grid, _ = module.apply(v, xs, method=DeformSegmentation.grids)
        from fovealseg_tpu.core.warp import grid_sample

        xsamp = grid_sample(x, grid).astype(module.dtype)
        feat = module.apply(v, xsamp, method=lambda m, t: m.encoder(t, train=False))[0]
        pred = module.apply(v, feat, method=lambda m, t: m.decoder([t], train=False))
        return pred.astype(jnp.float32), grid

    pred0, grid0 = jax.jit(upto_pred)(variables, x, f)
    th, tw, c = pred0.shape[1], pred0.shape[2], pred0.shape[3]
    m_pow = 1 << max(1, (c - 1).bit_length())
    cls0 = jnp.argmax(halfpixel_avg(pred0), axis=-1).astype(jnp.int32)
    flat_task = jnp.broadcast_to(
        jnp.arange(th * tw, dtype=jnp.int32)[None], (BATCH, th * tw))
    combined0 = flat_task * m_pow + cls0.reshape(BATCH, th * tw)
    canvas0 = jax.jit(lambda g, comb: landing_scatter_max(g, seg_hw, comb))(
        grid0, combined0)
    rounds0 = jax.jit(lambda g: jfa_rounds_from_grid(g, seg_hw))(grid0)

    # each stage's PRIMARY input is the chained arg (args[0] gets the carry
    # perturbation), so nothing hoists out of the timing loop — a closed-over
    # carry-independent input would be computed once and measure ~0
    from benchmarks.timing import time_op

    unwarp_stages = {
        "serving_full": (
            lambda a: module.apply(
                variables, a, f, argmax_labels=True,
                method=DeformSegmentation.infer)["pred_label"],
            x),
        "unwarp_halfpix_argmax": (
            lambda p: jnp.argmax(halfpixel_avg(p), axis=-1).astype(jnp.int32),
            pred0),
        "unwarp_scatter": (
            lambda g: landing_scatter_max(g, seg_hw, combined0), grid0),
        "unwarp_jfa": (
            lambda cv: _nearest_payload(
                cv >= 0, jnp.where(cv >= 0, cv % m_pow, 0),
                None, rounds0, cls_bits=m_pow.bit_length() - 1),
            canvas0.astype(jnp.int32)),
        "unwarp_total": (
            lambda p: unwarp_argmax_scatter(p, grid0, seg_hw, None, rounds0),
            pred0),
    }
    for name, (fn, arg) in unwarp_stages.items():
        dt = time_op(fn, arg, n1=5, n2=25)
        results[name] = dt * 1e3
        print(f"{name}: {dt*1e3:.2f} ms/batch{BATCH}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
