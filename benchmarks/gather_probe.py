"""Microbench: formulations of the full-res score-map gather (VERDICT r2 #8).

The score-map inverse warp ends in a 3.3M-row gather (b8: [B,640,640] int32
task indices into the [B, 6400, 51] f32 half-pixel-averaged prediction).
Measured round 2: the axis-0 flattened form runs 8.2 ms — 35% of the
score-map path. Mosaic has no vector gather (probed: jnp.take inside a
Pallas kernel fails to lower), so the options are XLA formulations:

  flat      axis-0 flattened rank-1-index gather (round-2 baseline)
  flat_bf16 same, bf16 rows (half the bytes; costs exactness at 2nd decimal)
  flat_pad64  f32 rows padded to C=64 lanes (lane-aligned row copies)
  per_sample  vmap of per-sample [640^2] gathers from [6400, 51]
  take_along  batched take_along_axis (round-2 measured 21.4 ms; control)
  onehot_mm   [N,T]x[T,C] one-hot matmul in bf16 (MXU roofline check)

Run on an idle chip: python benchmarks/gather_probe.py  (B env: batch).
Prints ms per variant + max abs error vs the f32 flat reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.timing import time_op

B = int(os.environ.get("B", "8"))
HS = WS = 640
TH = TW = 80
C = 51
T = TH * TW


def flat(values, idx):
    b, t, c = values.shape
    flatv = values.reshape(b * t, c)
    off = jnp.arange(b, dtype=idx.dtype)[:, None] * t
    return flatv[(idx + off).reshape(-1)].reshape(b, idx.shape[1], c)


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, T, (B, HS * WS)), jnp.int32)

    ref = np.asarray(flat(vals, idx))

    variants = {}
    variants["flat"] = lambda v, i: flat(v, i)
    variants["flat_bf16"] = lambda v, i: flat(v.astype(jnp.bfloat16), i)
    vals_pad = jnp.pad(vals, ((0, 0), (0, 0), (0, 64 - C)))
    variants["flat_pad64"] = lambda v, i: flat(vals_pad, i)[..., :C]
    variants["per_sample"] = lambda v, i: jax.vmap(lambda vv, ii: vv[ii])(v, i)
    variants["take_along"] = lambda v, i: jnp.take_along_axis(
        v, i[..., None], axis=1)
    variants["onehot_bf16"] = lambda v, i: jax.vmap(
        lambda vv, ii: jax.nn.one_hot(ii, T, dtype=jnp.bfloat16)
        @ vv.astype(jnp.bfloat16))(v, i)

    for name, fn in variants.items():
        try:
            out = np.asarray(fn(vals, idx), np.float32)
            err = float(np.abs(out - ref).max())
            dt = time_op(lambda i: fn(vals, i), idx, n1=5, n2=25)
            print(f"{name:12s} {dt*1e3:7.2f} ms   max_err {err:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
