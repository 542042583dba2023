"""Pallas TPU kernel: fused jump-flood nearest-seed computation.

The inverse-warp hole fill (fovealseg_tpu.core.unwarp.nearest_seed_jfa) runs
~ceil(log2(max(H,W)))+1 rounds of 8 shifted compares over [H, W] index maps.
As XLA ops each round re-reads/re-writes HBM; at 640x640 that is ~20 HBM
round-trips over ~5 MB of state. This kernel keeps the whole state
(seed_y, seed_x, best-dist) resident in VMEM for the entire chain — one HBM
read of the validity mask and one write of the result per batch item.

Shifts are circular ``pltpu.roll``s with the wrapped lanes masked invalid
(standard JFA samples nothing beyond the edges), which keeps the unrolled
round count Mosaic-friendly. ``nearest_payload_pallas`` additionally carries
an int32 payload with each seed (used by the fast inverse-warp path).

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


def _jfa_kernel(rounds_ref, valid_ref, payload_ref, out_ref, *, h: int, w: int,
                max_rounds: int, use_payload: bool):
    from jax.experimental.pallas import tpu as pltpu

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = valid_ref[0] != 0

    # seeds packed as y*w + x — halves VMEM-resident state (the 640x640
    # problem would not fit with separate y/x arrays)
    inf = jnp.float32(jnp.inf)
    packed0 = rows * w + cols
    seed = jnp.where(valid, packed0, 0)
    pay = jnp.where(valid, payload_ref[0], 0)
    best = jnp.where(valid, jnp.float32(0), inf)

    # runtime-variable chain length (scalar-prefetched): rounds R means steps
    # 2^(R-1), ..., 2, 1, plus the extra final 1-step round — R+1 trips; the
    # trip count is a traced scalar so short chains (grid-derived bound,
    # core.unwarp.jfa_rounds_from_grid) skip work entirely.
    rounds = jnp.clip(rounds_ref[0], 1, max_rounds)
    n_rounds = rounds + 1
    first_k = (1 << (rounds - 1)).astype(jnp.int32)

    def roll(x, dy, dx):
        # circular shift by traced offsets; wrapped lanes masked via `ok`
        x = pltpu.roll(x, (-dy) % h, 0)
        x = pltpu.roll(x, (-dx) % w, 1)
        return x

    def round_body(i, carry):
        seed, pay, best = carry
        # k halves each round: first_k, first_k/2, ..., 1, (extra final 1)
        k = jnp.maximum(first_k >> i, 1)
        for sy in (-1, 0, 1):
            for sx in (-1, 0, 1):
                if sy == 0 and sx == 0:
                    continue
                dy = sy * k
                dx = sx * k
                # candidate at (r, c) reads source (r+dy, c+dx); wrapped
                # lanes (source out of range) are invalid
                ok = (rows + dy >= 0) & (rows + dy < h) & (cols + dx >= 0) & (cols + dx < w)
                cand = roll(seed, dy, dx)
                cb = roll(best, dy, dx)
                ddy = (cand // w - rows).astype(jnp.float32)
                ddx = (cand % w - cols).astype(jnp.float32)
                d = jnp.where(ok & (cb < inf), ddy * ddy + ddx * ddx, inf)
                better = d < best
                seed = jnp.where(better, cand, seed)
                if use_payload:
                    pay = jnp.where(better, roll(pay, dy, dx), pay)
                best = jnp.where(better, d, best)
        return seed, pay, best

    seed, pay, best = jax.lax.fori_loop(0, n_rounds, round_body, (seed, pay, best))
    out_ref[0] = pay if use_payload else seed


def _pallas_jfa_call(valid, payload, num_iters, interpret, use_payload, rounds=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = valid.shape
    full = max(1, math.ceil(math.log2(max(h, w))))
    if rounds is None:
        rounds = jnp.asarray(num_iters or full, jnp.int32)
    rounds = jnp.asarray(rounds, jnp.int32).reshape(1)

    kernel = functools.partial(_jfa_kernel, h=h, w=w, max_rounds=full,
                               use_payload=use_payload)
    # index maps receive the scalar-prefetch ref as a trailing arg
    spec = lambda: pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as _pt

        # the carry (packed seed + payload + best) plus rolled temporaries
        # exceeds the default 16M scoped budget at 640x640
        kwargs["compiler_params"] = _pt.CompilerParams(vmem_limit_bytes=100 * 2**20)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[spec(), spec()],
        out_specs=spec(),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},  # payload buffer reused for the output
        interpret=interpret,
        **kwargs,
    )(rounds, valid.astype(jnp.int32), payload.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("num_iters", "interpret"))
def nearest_seed_pallas(valid: jnp.ndarray, num_iters: int | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas JFA: valid [B, H, W] bool -> nearest-valid flat index [B, H, W]."""
    return _pallas_jfa_call(valid, jnp.zeros_like(valid, jnp.int32), num_iters,
                            interpret, use_payload=False)


@functools.partial(jax.jit, static_argnames=("num_iters", "interpret"))
def nearest_payload_pallas(valid: jnp.ndarray, payload: jnp.ndarray,
                           num_iters: int | None = None,
                           interpret: bool = False,
                           rounds: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pallas payload-carrying JFA: every pixel gets the payload of its
    nearest valid pixel (core.unwarp.nearest_seed_payload equivalent).

    ``rounds`` (traced int32 scalar) overrides the chain length at runtime —
    pass a data-derived bound (core.unwarp.jfa_rounds_from_grid) to skip
    rounds the hole geometry cannot need."""
    return _pallas_jfa_call(valid, payload, num_iters, interpret,
                            use_payload=True, rounds=rounds)


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
