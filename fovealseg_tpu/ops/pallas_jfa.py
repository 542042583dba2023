"""Pallas TPU kernel: fused jump-flood nearest-seed computation.

The inverse-warp hole fill (fovealseg_tpu.core.unwarp.nearest_seed_jfa) runs
~ceil(log2(max(H,W)))+1 rounds of 8 shifted compares over [H, W] index maps.
As XLA ops each round re-reads/re-writes HBM; at 640x640 that is ~20 HBM
round-trips over ~5 MB of state. This kernel keeps the whole state resident
in VMEM for the entire chain — one HBM read of the validity mask and one
write of the result per batch item.

State packing (the round-2.5 speedup): a seed is one int32
``(y << XB | x) << CB | payload`` with power-of-2 strides, so each of the 8
candidates per round costs ONE ``pltpu.roll`` plus shift/and extracts and an
int32 distance — the earlier formulation rolled three arrays (seed, payload,
best-distance) and used integer div/mod by the non-pow2 width. Validity is
the sign bit (-1 = no seed), replacing the rolled best-distance check;
``best`` is recomputed locally and never shifted. Payloads too wide to pack
(e.g. flat task indices) fall back to a second rolled array.

Shifts are circular ``pltpu.roll``s with the wrapped lanes masked invalid
(standard JFA samples nothing beyond the edges), which keeps the round body
Mosaic-friendly. ``nearest_seed`` dispatches to the kernel on TPU and falls
back to the lax implementation elsewhere; all variants are tested for
equivalence against the lax chain.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


_INT_INF = 2**30  # > any squared pixel distance at <= 1024^2


_REL_BITS = 9  # relpay offset field width: offsets in [-256, 255]
_REL_BIAS = 1 << (_REL_BITS - 1)
# max displacement after R rounds (steps 2^(R-1)..1 plus the extra 1-step
# round) is 2^R, so the 9-bit biased fields are safe for rounds <= 7
REL_MAX_ROUNDS = _REL_BITS - 2


def _jfa_kernel(rounds_ref, valid_ref, payload_ref, out_ref, *, h: int, w: int,
                max_rounds: int, mode: str, cls_bits: int):
    """mode: 'seed' -> out = nearest flat index y*w+x;
    'payload' -> out = payload of nearest seed (payload rolled alongside);
    'class'  -> out = payload of nearest seed, payload packed into the seed
    word (payload < 2**cls_bits required);
    'relpay' -> like 'class' but the position rides as RELATIVE offsets
    (dy, dx) biased into two 9-bit fields, freeing enough bits for payloads
    up to 13 bits (flat task indices) at one roll per candidate. Offsets are
    updated arithmetically on each roll; only correct while the total
    displacement stays within the field range, i.e. rounds <= REL_MAX_ROUNDS
    (callers lax.cond to the two-array kernel beyond that)."""
    from jax.experimental.pallas import tpu as pltpu

    xb = max(1, (w - 1).bit_length())  # pow2 x-stride
    cb = cls_bits if mode in ("class", "relpay") else 0
    if mode == "relpay":
        assert cb + 2 * _REL_BITS <= 31, cb
        assert max_rounds <= REL_MAX_ROUNDS, max_rounds
    else:
        assert ((h - 1) << xb << cb | (w - 1) << cb) < 2**31 - 1

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = valid_ref[0] != 0

    pos0 = (rows << xb) | cols
    if mode == "class":
        packed = jnp.where(valid, (pos0 << cb) | payload_ref[0], -1)
        pay = jnp.zeros((h, w), jnp.int32)  # unused
    elif mode == "relpay":
        zero_off = (_REL_BIAS << (_REL_BITS + cb)) | (_REL_BIAS << cb)
        packed = jnp.where(valid, zero_off | payload_ref[0], -1)
        pay = jnp.zeros((h, w), jnp.int32)  # unused
    else:
        packed = jnp.where(valid, pos0, -1)
        pay = jnp.where(valid, payload_ref[0], 0)
    best = jnp.where(valid, 0, _INT_INF).astype(jnp.int32)

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
        packed, pay, best = carry
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
                cand = roll(packed, dy, dx)
                if mode == "relpay":
                    # source's (dy, dx) fields are relative to the source;
                    # relative to the receiving pixel they shift by the roll
                    # offset — one scalar-broadcast add on the packed word
                    shifted = cand + ((dy << (_REL_BITS + cb)) + (dx << cb))
                    rmask = (1 << _REL_BITS) - 1
                    ddy = ((shifted >> (_REL_BITS + cb)) & rmask) - _REL_BIAS
                    ddx = ((shifted >> cb) & rmask) - _REL_BIAS
                    d = ddy * ddy + ddx * ddx
                    better = ok & (cand >= 0) & (d < best)
                    packed = jnp.where(better, shifted, packed)
                    best = jnp.where(better, d, best)
                    continue
                pos = cand >> cb if cb else cand
                ddy = (pos >> xb) - rows
                ddx = (pos & ((1 << xb) - 1)) - cols
                d = ddy * ddy + ddx * ddx
                better = ok & (cand >= 0) & (d < best)
                packed = jnp.where(better, cand, packed)
                if mode == "payload":
                    pay = jnp.where(better, roll(pay, dy, dx), pay)
                best = jnp.where(better, d, best)
        return packed, pay, best

    packed, pay, best = jax.lax.fori_loop(0, n_rounds, round_body, (packed, pay, best))
    if mode == "payload":
        out_ref[0] = pay
    elif mode in ("class", "relpay"):
        out_ref[0] = jnp.where(packed >= 0, packed & ((1 << cb) - 1), 0)
    else:
        pos = jnp.maximum(packed, 0)
        out_ref[0] = (pos >> xb) * w + (pos & ((1 << xb) - 1))


def _pallas_jfa_call(valid, payload, num_iters, interpret, mode, rounds=None,
                     cls_bits: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = valid.shape
    full = max(1, math.ceil(math.log2(max(h, w))))
    if mode == "relpay":
        full = min(full, REL_MAX_ROUNDS)
    if rounds is None:
        rounds = jnp.asarray(num_iters or full, jnp.int32)
    rounds = jnp.asarray(rounds, jnp.int32).reshape(1)

    kernel = functools.partial(_jfa_kernel, h=h, w=w, max_rounds=full,
                               mode=mode, cls_bits=cls_bits)
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
                            interpret, mode="seed")


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
                            mode="payload", rounds=rounds)


@functools.partial(jax.jit, static_argnames=("cls_bits", "num_iters", "interpret"))
def nearest_class_pallas(valid: jnp.ndarray, payload: jnp.ndarray,
                         cls_bits: int,
                         num_iters: int | None = None,
                         interpret: bool = False,
                         rounds: jnp.ndarray | None = None) -> jnp.ndarray:
    """Packed-payload JFA for narrow payloads (payload < 2**cls_bits): the
    payload rides in the seed word, so each candidate costs one roll instead
    of two. Used by the argmax serving path (class ids)."""
    b, h, w = valid.shape
    xb = max(1, (w - 1).bit_length())
    if ((h - 1) << xb << cls_bits | (w - 1) << cls_bits) >= 2**31 - 1:
        return nearest_payload_pallas(valid, payload, num_iters, interpret, rounds)
    return _pallas_jfa_call(valid, payload, num_iters, interpret,
                            mode="class", rounds=rounds, cls_bits=cls_bits)


@functools.partial(jax.jit, static_argnames=("pay_bits", "num_iters", "interpret"))
def nearest_payload_packed_pallas(valid: jnp.ndarray, payload: jnp.ndarray,
                                  pay_bits: int,
                                  num_iters: int | None = None,
                                  interpret: bool = False,
                                  rounds: jnp.ndarray | None = None) -> jnp.ndarray:
    """One-roll packed JFA for mid-width payloads (pay_bits <= 13, e.g. the
    score-map path's flat task indices) via RELATIVE-offset position packing
    ('relpay' mode): (dy+256, dx+256) ride in two 9-bit fields next to the
    payload, updated arithmetically per roll, so each candidate costs one
    roll like the class kernel instead of the two-array variant's two.

    Only correct while the chain's total displacement fits the offset
    fields (rounds <= REL_MAX_ROUNDS == 7, i.e. max hole radius < 64 px —
    true for every production grid measured; jfa_rounds_from_grid bounds it
    per input). A runtime ``lax.cond`` falls back to the exact two-array
    kernel for wider-hole grids, so results are always exact."""
    if pay_bits + 2 * _REL_BITS > 31:
        return nearest_payload_pallas(valid, payload, num_iters, interpret,
                                      rounds)
    if rounds is None:
        b, h, w = valid.shape
        full = max(1, math.ceil(math.log2(max(h, w))))
        rounds = jnp.asarray(num_iters or full, jnp.int32)

    def rel(_):
        return _pallas_jfa_call(valid, payload, num_iters, interpret,
                                mode="relpay",
                                rounds=jnp.minimum(rounds, REL_MAX_ROUNDS),
                                cls_bits=pay_bits)

    def two(_):
        return _pallas_jfa_call(valid, payload, num_iters, interpret,
                                mode="payload", rounds=rounds)

    return jax.lax.cond(jnp.asarray(rounds, jnp.int32).reshape(())
                        <= REL_MAX_ROUNDS, rel, two, None)


def nearest_seed(valid: jnp.ndarray, num_iters: int | None = None) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, lax JFA elsewhere.

    Delegates to the single dispatcher in ``core.unwarp`` so the
    ``FOVEALSEG_PALLAS_JFA=0`` opt-out applies everywhere and kernel
    failures surface instead of silently falling back to the ~20x-slower
    lax chain (import is call-time to avoid a module cycle)."""
    from fovealseg_tpu.core.unwarp import _nearest_seed

    return _nearest_seed(valid, num_iters)
