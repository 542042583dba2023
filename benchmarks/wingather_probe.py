"""On-chip probe: windowed Pallas row gather vs the XLA flat gather.

Times the production windowed kernel (fovealseg_tpu/ops/pallas_gather.py —
see its docstring for the design) against the XLA axis-0 flat gather it
replaces, at the exact full-res score-map shape: 3.3M rows of 51 f32 from
[8, 6400, 51] (the 8.2 ms floor of benchmarks/gather_probe.py).

Index fields are realistic monotone foveated warps (dense near a random
gaze point per sample) — the same locality the production payload-JFA
output has. Also reports the coverage rate of the windowed fast path.

Usage: python benchmarks/wingather_probe.py      (TPU)
       INTERPRET=1 python benchmarks/wingather_probe.py   (CPU exactness)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INTERPRET = bool(int(os.environ.get("INTERPRET", "0")))

import jax

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fovealseg_tpu.ops.pallas_gather import windowed_row_gather

B, H, WID, C, T = 8, 640, 640, 51, 6400


def make_realistic_idx(rng, b):
    """Task indices shaped like the production JFA output: a monotone
    foveated warp (dense near a random gaze point) + nearest-cell rounding."""
    idxs = []
    for _ in range(b):
        g = rng.uniform(0.2, 0.8, 2)
        ys = np.linspace(0, 1, H)
        xs = np.linspace(0, 1, WID)
        wy = 1.0 / (np.abs(ys - g[0]) + 0.08)
        wx = 1.0 / (np.abs(xs - g[1]) + 0.08)
        ty = np.clip((np.cumsum(wy) / wy.sum() * 79.999).astype(np.int64), 0, 79)
        tx = np.clip((np.cumsum(wx) / wx.sum() * 79.999).astype(np.int64), 0, 79)
        idxs.append(ty[:, None] * 80 + tx[None, :])
    return np.stack(idxs).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((B, T, C)).astype(np.float32)
    idx_np = make_realistic_idx(rng, B)
    tj = jnp.asarray(table)
    ij = jnp.asarray(idx_np)

    # coverage of the fast path at production tile/window geometry
    idx_t = idx_np.reshape(B, H // 8, 8 * WID)
    h0 = np.clip(idx_t.min(2) >> 7, 0, T // 128 - 4)
    cov = (idx_t.max(2) - h0 * 128 < 512).mean()

    out = np.asarray(windowed_row_gather(tj, ij, interpret=INTERPRET))
    ref = np.take_along_axis(
        table, idx_np.reshape(B, -1, 1).astype(np.int64), axis=1
    ).reshape(B, H, WID, C)
    exact = np.array_equal(out, ref)
    print(f"tile coverage {cov:.4f}; output bit-exact: {exact}", flush=True)
    assert exact

    if INTERPRET:
        return

    from benchmarks.timing import time_op

    def xla_gather(idx):
        flat = tj.reshape(B * T, C)
        off = jnp.arange(B, dtype=jnp.int32)[:, None] * T
        return flat[(idx.reshape(B, -1) + off).reshape(-1)].reshape(B, H, WID, C)

    dt = time_op(xla_gather, ij, n1=5, n2=25)
    print(f"XLA flat gather:        {dt*1e3:.3f} ms", flush=True)

    dt = time_op(lambda i: windowed_row_gather(tj, i), ij, n1=5, n2=25)
    print(f"windowed Pallas gather: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
