"""Windowed Pallas row gather for the full-res score-map inverse warp.

The score-map path's largest stage is the final row gather — out[p, :] =
table[idx[p], :] for 3.3M canvas pixels from a [B, 6400, C] task-space
table — measured at its XLA floor of 8.2 ms/b8 640^2x51
(benchmarks/gather_probe.py; the reference's pred_sampled surface,
/root/reference/models/models_instance.py:883-893).

Mosaic has no cross-vreg vector gather (re-probed on jax 0.9:
``take_along_axis`` lowers only within one vreg — lane axis at <=128 lanes,
sublane axis at <=8 sublanes). This kernel gets around that with the
inverse warp's *locality*: the payload-JFA indices of a tile of consecutive
canvas rows cluster into a narrow band of task cells (the forward warp is
monotone, so a tile of 8 canvas rows touches a handful of task rows plus
the JFA halo). Formulation:

  - host side derives, per tile, the 128-aligned window start from the
    tile's min index (one tiny XLA reduce) and passes it as a
    scalar-prefetch array: the BlockSpec index maps DMA exactly the
    ``blocks`` 128-cell window blocks of a channel-major-blocked table
    [B, T/128, Cpad, 128] — the table itself never leaves HBM;
  - in-kernel, each 128-lane column of pixels gathers its value with ONE
    ``take_along_axis`` per (channel x window-block) from a
    sublane-broadcast of the block row, merged by a window-block select —
    ~3 vreg ops per channel-block-pixelvreg, all f32, bit-exact;
  - a per-tile coverage flag ((idx - start) within the window for every
    pixel) is reduced by the caller into ONE ``lax.cond`` that falls back
    to the XLA flat gather on pathological warps — exactness is therefore
    unconditional, the fast path just stops being fast if a warp compresses
    more than ``blocks*128`` cells under one tile.

Measured (benchmarks/wingather_probe.py, b8 640^2x51 production shape):
see PERF.md "windowed gather" — the dispatch default lives in
``TPU.scoremap_gather``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel_impl(h0_ref, idx_ref, w0, w1, w2, w3, out_ref, *, c,
                 rows, width, blocks):
    from jax.experimental import pallas as pl

    idx = idx_ref[0]  # [rows, width] int32
    h0 = h0_ref[pl.program_id(0), pl.program_id(1)]
    base = h0 * 128
    top = blocks * 128
    # coverage is asserted host-side (same tile reductions that build h0);
    # the clip only bounds the lanes when the caller is about to fall back
    wloc = jnp.clip(idx - base, 0, top - 1)
    wins = (w0, w1, w2, w3)[:blocks]
    for sc in range(width // 128):
        lo = wloc[:, sc * 128:(sc + 1) * 128] & 127
        hi = wloc[:, sc * 128:(sc + 1) * 128] >> 7
        for ch in range(c):
            acc = jnp.zeros((rows, 128), jnp.float32)
            for k in range(blocks):
                src = jnp.broadcast_to(wins[k][0, 0, ch:ch + 1, :], (rows, 128))
                cand = jnp.take_along_axis(src, lo, axis=1)
                acc = jnp.where(hi == k, cand, acc)
            out_ref[0, ch, :, sc * 128:(sc + 1) * 128] = acc


def windowed_gather_supported(values: jnp.ndarray, idx: jnp.ndarray,
                              rows: int = 8) -> bool:
    """Static shape gate for the windowed kernel (mirrors _use_pallas_jfa)."""
    b, t, c = values.shape
    h, w = idx.shape[1], idx.shape[2]
    return (t % 128 == 0 and w % 128 == 0 and h % rows == 0 and c <= 512
            and t // 128 >= 4)


@functools.partial(jax.jit, static_argnames=("rows", "blocks", "interpret"))
def windowed_row_gather(values: jnp.ndarray, idx: jnp.ndarray,
                        rows: int = 8, blocks: int = 4,
                        interpret: bool = False) -> jnp.ndarray:
    """out[b, y, x, :] = values[b, idx[b, y, x], :], bit-exact.

    values: [B, T, C] float32 (T % 128 == 0); idx: [B, H, W] int32 in
    [0, T). Fast windowed Pallas path per tile of ``rows`` canvas rows with
    a ``lax.cond`` whole-batch fallback to the XLA flat gather when any
    tile's index span exceeds the ``blocks``*128-cell window.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = values.shape
    h, w = idx.shape[1], idx.shape[2]
    tb = t // 128
    cpad = -(-c // 8) * 8
    ntile = h // rows

    # channel-major-blocked table: [B, TB, Cpad, 128]
    t3 = values.reshape(b, tb, 128, c).transpose(0, 1, 3, 2)
    if cpad != c:
        t3 = jnp.pad(t3, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))

    # per-tile window starts (block units), clamped so blocks fit; coverage
    # is decided here too (block (1,1) outputs are not lane-representable
    # in Mosaic, and the reductions are already needed for h0)
    idx_t = idx.reshape(b, ntile, rows * w)
    tile_min = jnp.min(idx_t, axis=2)
    tile_max = jnp.max(idx_t, axis=2)
    h0 = jnp.clip(tile_min >> 7, 0, tb - blocks).astype(jnp.int32)
    covered = jnp.all(tile_max - h0 * 128 < blocks * 128)

    kern = functools.partial(_kernel_impl, c=c, rows=rows, width=w,
                             blocks=blocks)

    def win_spec(k):
        return pl.BlockSpec((1, 1, cpad, 128),
                            lambda i, j, s: (i, s[i, j] + k, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ntile),
        in_specs=[pl.BlockSpec((1, rows, w), lambda i, j, s: (i, j, 0))]
        + [win_spec(k) for k in range(blocks)],
        out_specs=pl.BlockSpec((1, cpad, rows, w), lambda i, j, s: (i, 0, j, 0)),
    )
    out_cm = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, cpad, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(h0, idx, t3, t3, t3, t3)

    def fast(_):
        return jnp.transpose(out_cm[:, :c], (0, 2, 3, 1))

    def slow(_):
        flat = values.reshape(b * t, c)
        off = jnp.arange(b, dtype=idx.dtype)[:, None] * t
        return flat[(idx.reshape(b, -1) + off).reshape(-1)].reshape(b, h, w, c)

    return jax.lax.cond(covered, fast, slow, None)
