"""On-chip A/B of the full-res score-map path's gather/JFA implementations.

Times ``DeformSegmentation.infer``'s pred_sampled surface (the reference's
models_instance.py:883-893 score-map product) end to end at the flagship
config, across the round-5 kernel variants:

  xla       TPU.scoremap_gather="xla"      (round-4 production path)
  windowed  TPU.scoremap_gather="windowed" (ops/pallas_gather.py)

Both run on top of the packed relative-offset payload JFA (relpay) that
round 5 made the task-index default; FOVEALSEG_PALLAS_JFA=0 would expose
the lax chain instead. Also times the serving argmax path as the control
(it shares the forward + JFA machinery but must be unaffected by the
score-map knob).

Usage: python benchmarks/scoremap_probe.py   (prints one line per variant)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from benchmarks.timing import time_op
from fovealseg_tpu.models.deform_module import DeformSegmentation

BATCH = int(os.environ.get("BATCH", "8"))


def main():
    from __graft_entry__ import _flagship

    module = _flagship(dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 640, 640, 3))
    f = jnp.full((BATCH, 2), 0.4, jnp.float32)
    shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
    variables = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    outs = {}
    for impl in ("xla", "windowed"):
        mod = DeformSegmentation(
            config=dataclasses.replace(module.config, scoremap_gather=impl),
            dtype=jnp.bfloat16,
        )
        fn = lambda x, m=mod: m.apply(
            variables, x, f, method=DeformSegmentation.infer)["pred_sampled"]
        outs[impl] = jax.jit(fn)(x)
        dt = time_op(fn, x, n1=5, n2=25)
        print(f"score-map path [{impl:8s}]: {dt*1e3:7.3f} ms/b{BATCH} "
              f"({BATCH/dt:6.1f} fps)", flush=True)

    same = bool(jnp.all(outs["xla"] == outs["windowed"]))
    print(f"windowed == xla bit-exact: {same}", flush=True)
    assert same

    fn = lambda x: module.apply(
        variables, x, f, argmax_labels=True,
        method=DeformSegmentation.infer)["pred_label"]
    dt = time_op(fn, x, n1=5, n2=25)
    print(f"serving argmax control    : {dt*1e3:7.3f} ms/b{BATCH} "
          f"({BATCH/dt:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
