"""Pallas TPU kernel: fused jump-flood nearest-seed computation.

The inverse-warp hole fill (fovealseg_tpu.core.unwarp.nearest_seed_jfa) runs
~ceil(log2(max(H,W)))+1 rounds of 8 shifted compares over [H, W] index maps.
As XLA ops each round re-reads/re-writes HBM; at 640x640 that is ~20 HBM
round-trips over ~5 MB of state. This kernel keeps the whole state
(seed_y, seed_x, best-dist) resident in VMEM for the entire chain — one HBM
read of the validity mask and one write of the result per batch item.

Shifts use static ``k`` per unrolled round, so edge-clamped shifting is a
static slice + broadcast-edge concat (no gathers — Mosaic-friendly).

``nearest_seed`` dispatches to the kernel on TPU and falls back to the lax
implementation elsewhere; both are tested for equivalence.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from fovealseg_tpu.core.unwarp import nearest_seed_jfa


def _shift_clamp(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Static-offset shift of [H, W] with edge clamping via slice+concat."""
    h, w = x.shape
    if dy > 0:
        x = jnp.concatenate([x[dy:], jnp.broadcast_to(x[-1:], (dy, w))], axis=0)
    elif dy < 0:
        x = jnp.concatenate([jnp.broadcast_to(x[:1], (-dy, w)), x[:dy]], axis=0)
    if dx > 0:
        x = jnp.concatenate([x[:, dx:], jnp.broadcast_to(x[:, -1:], (h, dx))], axis=1)
    elif dx < 0:
        x = jnp.concatenate([jnp.broadcast_to(x[:, :1], (h, -dx)), x[:, :dx]], axis=1)
    return x


def _jfa_kernel(valid_ref, out_ref, *, h: int, w: int, steps: tuple):
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = valid_ref[0] != 0

    inf = jnp.float32(jnp.inf)
    seed_y = jnp.where(valid, rows, 0)
    seed_x = jnp.where(valid, cols, 0)
    best = jnp.where(valid, jnp.float32(0), inf)

    for k in steps:
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cy = _shift_clamp(seed_y, dy, dx)
                cx = _shift_clamp(seed_x, dy, dx)
                cb = _shift_clamp(best, dy, dx)
                ddy = (cy - rows).astype(jnp.float32)
                ddx = (cx - cols).astype(jnp.float32)
                d = jnp.where(cb < inf, ddy * ddy + ddx * ddx, inf)
                better = d < best
                seed_y = jnp.where(better, cy, seed_y)
                seed_x = jnp.where(better, cx, seed_x)
                best = jnp.where(better, d, best)

    out_ref[0] = seed_y * w + seed_x


@functools.partial(jax.jit, static_argnames=("num_iters", "interpret"))
def nearest_seed_pallas(valid: jnp.ndarray, num_iters: int | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas JFA: valid [B, H, W] bool -> nearest-valid flat index [B, H, W]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = valid.shape
    n = num_iters or max(1, math.ceil(math.log2(max(h, w))))
    steps = tuple(1 << (n - 1 - i) for i in range(n)) + (1,)

    kernel = functools.partial(_jfa_kernel, h=h, w=w, steps=steps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(valid.astype(jnp.int32))


def nearest_seed(valid: jnp.ndarray, num_iters: int | None = None) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, lax JFA elsewhere."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        try:
            return nearest_seed_pallas(valid, num_iters)
        except Exception:
            pass
    return nearest_seed_jfa(valid, num_iters)
