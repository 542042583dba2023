"""Inverse foveated warp + hole filling, fully on-device.

The reference's inference path (models/models_instance.py:839-949) samples the
prediction through the scatter-built inverse grid, NaN-masks unhit pixels,
then round-trips to CPU per sample to fill holes with scipy
(NearestNDInterpolator / LinearNDInterpolator) or the vendored
Delaunay-barycentric ``Interp2D`` (/root/reference/interp2d.py:14-91,
fillMissingValues_tensor models/models.py:159-286).

TPU-native design: a hole pixel's nearest *valid* pixel is found with a
jump-flood pass (fixed ``ceil(log2(max(H,W)))+1`` iterations — static control
flow for XLA); the hole then adopts that pixel's inverse-grid coordinates, so
a single gather (``grid_sample``) both inverse-warps and hole-fills. This is
exactly equivalent to nearest-fill of the sampled values, because a valid
pixel's value is a pure function of its inverse-grid coordinates
(``rev_deform_interp='nearest'``; scipy tie-breaks may differ on equidistant
seeds). 'BI' and 'tri' modes interpolate *values*, so they run after the
gather (see ``fill_values_*``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from fovealseg_tpu.core.warp import grid_sample


def _gather_rows_flat(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values [B, T, C] gathered at idx [B, N] -> [B, N, C].

    Expressed as a single axis-0 gather over the flattened [B*T, C] array:
    measured 2.6x faster than batched ``take_along_axis`` for the full-res
    unwarp shape (3.3M rows from [8, 6400, 51]: 8.2 ms vs 21.4 ms on-chip) —
    XLA picks a better gather lowering for the rank-1 index case.
    """
    b, t, c = values.shape
    flat = values.reshape(b * t, c)
    off = jnp.arange(b, dtype=idx.dtype)[:, None] * t
    return flat[(idx + off).reshape(-1)].reshape(b, idx.shape[1], c)


def jfa_rounds_from_grid(grid: jnp.ndarray, seg_hw: tuple[int, int]) -> jnp.ndarray:
    """Runtime JFA round count derived from the forward grid's geometry.

    The scattered landing points form a warped mesh over the canvas; every
    canvas pixel lies within one warped cell of that mesh (the clamped grid
    pins the boundary to the canvas edges), so its nearest seed is at most
    one cell diagonal away. Rounds = ceil(log2(max cell diagonal)) + 1
    safety round. Returns an int32 scalar in [2, ceil(log2(max(H, W)))].
    (VERDICT r1 item 3: TPU.jfa_iters derived from grid geometry.)
    """
    hs, ws = seg_hw
    u = (grid[..., 0] + 1.0) * 0.5 * (ws - 1)
    v = (grid[..., 1] + 1.0) * 0.5 * (hs - 1)
    du_x = jnp.abs(jnp.diff(u, axis=2))
    dv_x = jnp.abs(jnp.diff(v, axis=2))
    du_y = jnp.abs(jnp.diff(u, axis=1))
    dv_y = jnp.abs(jnp.diff(v, axis=1))
    gap_x2 = jnp.max(du_x * du_x + dv_x * dv_x)
    gap_y2 = jnp.max(du_y * du_y + dv_y * dv_y)
    diag = jnp.sqrt(gap_x2 + gap_y2)  # cell diagonal <= sqrt(gapx^2 + gapy^2)
    full = max(1, math.ceil(math.log2(max(hs, ws))))
    r = jnp.ceil(jnp.log2(jnp.maximum(diag, 1.0) + 1.0)) + 1.0
    return jnp.clip(r.astype(jnp.int32), 2, full)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift [B,H,W,...] by (dy,dx) with edge clamping (candidates stay valid
    seeds, so clamping only duplicates border candidates — harmless)."""
    h, w = x.shape[1], x.shape[2]
    iy = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    ix = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return x[:, iy][:, :, ix]


def nearest_seed_jfa(valid: jnp.ndarray, num_iters: int | None = None) -> jnp.ndarray:
    """Jump-flood nearest-valid-pixel map.

    valid: [B, H, W] bool. Returns [B, H, W] int32 flat indices (y*W + x) of
    the (approximately) nearest True pixel; pixels that are themselves valid
    map to themselves. Assumes at least one valid pixel per sample.
    """
    b, h, w = valid.shape
    if num_iters is None:
        num_iters = max(1, math.ceil(math.log2(max(h, w))))
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)

    seed_y = jnp.where(valid, rows, 0)
    seed_x = jnp.where(valid, cols, 0)
    has = valid
    # squared distances stay < 2*dim^2 < 2^24 for dim <= 2048 -> exact in f32
    inf = jnp.float32(jnp.inf)

    def dist2(sy, sx, sh):
        dy = (sy - rows).astype(jnp.float32)
        dx = (sx - cols).astype(jnp.float32)
        return jnp.where(sh, dy * dy + dx * dx, inf)

    best = dist2(seed_y, seed_x, has)
    steps = [1 << (num_iters - 1 - i) for i in range(num_iters)] + [1]
    for k in steps:
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cy = _shift2d(seed_y, dy, dx)
                cx = _shift2d(seed_x, dy, dx)
                ch = _shift2d(has, dy, dx)
                d = dist2(cy, cx, ch)
                better = d < best
                seed_y = jnp.where(better, cy, seed_y)
                seed_x = jnp.where(better, cx, seed_x)
                has = has | (better & ch)
                best = jnp.where(better, d, best)
    return seed_y * w + seed_x


def _use_pallas_jfa(shape=None) -> bool:
    import os

    if os.environ.get("FOVEALSEG_PALLAS_JFA") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pad_to_vreg(arrs, fill):
    """Pad [B, H, W] arrays to Mosaic's vreg-aligned tile (H%8, W%128) with
    ``fill`` (invalid-seed padding: excluded from every JFA candidate set, so
    results on the original region are unchanged). Returns (padded, (h, w)).

    Mosaic's tpu.dynamic_rotate rejects unaligned tiles (e.g. the 320^2
    canvas of loss_at_high_res under segm_downsampling_rate=2); padding by
    <=7 rows / <=127 lanes costs ~20% extra kernel work vs the ~2-3x of the
    lax fallback chain."""
    h, w = arrs[0].shape[-2], arrs[0].shape[-1]
    ph = (-h) % 8
    pw = (-w) % 128
    if ph == 0 and pw == 0:
        return arrs, (h, w)
    out = [jnp.pad(a, ((0, 0), (0, ph), (0, pw)), constant_values=f)
           for a, f in zip(arrs, fill)]
    return out, (h, w)


def _nearest_seed(valid: jnp.ndarray, num_iters: int | None = None) -> jnp.ndarray:
    """Dispatch: fused VMEM-resident Pallas JFA on TPU (~2.2x the lax chain
    at 640x640; opt out with FOVEALSEG_PALLAS_JFA=0), else the lax JFA."""
    if _use_pallas_jfa():
        from fovealseg_tpu.ops.pallas_jfa import nearest_seed_pallas

        (v,), hw = _pad_to_vreg([valid], [False])
        out = nearest_seed_pallas(v, num_iters)
        if v.shape != valid.shape:
            # un-flatten/re-flatten the padded-width indices to the original
            pw = v.shape[-1]
            out = (out // pw) * hw[1] + out % pw
            out = out[:, :hw[0], :hw[1]]
        return out
    return nearest_seed_jfa(valid, num_iters)


def _nearest_payload(valid: jnp.ndarray, payload: jnp.ndarray,
                     num_iters: int | None = None,
                     rounds: jnp.ndarray | None = None,
                     cls_bits: int | None = None,
                     pay_bits: int | None = None) -> jnp.ndarray:
    """Payload-carrying dispatch (used by the fast inverse-warp path).

    ``rounds`` (optional traced int32 scalar) caps the jump-flood chain at a
    data-derived round count on the Pallas path (see jfa_rounds_from_grid);
    the lax fallback runs the full static chain, which is a superset (same
    result, CPU-only path). ``cls_bits`` (payload < 2**cls_bits) selects the
    packed one-roll-per-candidate kernel variant; ``pay_bits`` (payload <
    2**pay_bits, up to 13) the relative-offset packed variant with its
    runtime two-array fallback (ops/pallas_jfa.py::nearest_payload_packed)."""
    if _use_pallas_jfa():
        (v, p), hw = _pad_to_vreg([valid, payload], [False, 0])
        if cls_bits is not None:
            from fovealseg_tpu.ops.pallas_jfa import nearest_class_pallas

            out = nearest_class_pallas(v, p, cls_bits, num_iters, rounds=rounds)
        elif pay_bits is not None and pay_bits <= 13:
            from fovealseg_tpu.ops.pallas_jfa import nearest_payload_packed_pallas

            out = nearest_payload_packed_pallas(v, p, pay_bits, num_iters,
                                                rounds=rounds)
        else:
            from fovealseg_tpu.ops.pallas_jfa import nearest_payload_pallas

            out = nearest_payload_pallas(v, p, num_iters, rounds=rounds)
        return out[:, :hw[0], :hw[1]] if v.shape != valid.shape else out
    return nearest_seed_payload(valid, payload, num_iters)


def nearest_seed_payload(
    valid: jnp.ndarray, payload: jnp.ndarray, num_iters: int | None = None
) -> jnp.ndarray:
    """JFA that carries an int32 payload with each seed: returns [B, H, W]
    with every pixel holding the payload of its nearest valid pixel. Saves
    the separate payload gather after seed computation."""
    b, h, w = valid.shape
    if num_iters is None:
        num_iters = max(1, math.ceil(math.log2(max(h, w))))
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)

    seed_y = jnp.where(valid, rows, 0)
    seed_x = jnp.where(valid, cols, 0)
    pay = jnp.where(valid, payload, 0)
    inf = jnp.float32(jnp.inf)
    best = jnp.where(valid, jnp.float32(0), inf)

    steps = [1 << (num_iters - 1 - i) for i in range(num_iters)] + [1]
    for k in steps:
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cy = _shift2d(seed_y, dy, dx)
                cx = _shift2d(seed_x, dy, dx)
                cp = _shift2d(pay, dy, dx)
                cb = _shift2d(best, dy, dx)
                ddy = (cy - rows).astype(jnp.float32)
                ddx = (cx - cols).astype(jnp.float32)
                d = jnp.where(cb < inf, ddy * ddy + ddx * ddx, inf)
                better = d < best
                seed_y = jnp.where(better, cy, seed_y)
                seed_x = jnp.where(better, cx, seed_x)
                pay = jnp.where(better, cp, pay)
                best = jnp.where(better, d, best)
    return pay


def halfpixel_avg(pred: jnp.ndarray) -> jnp.ndarray:
    """P2[i, j] = mean of pred[{i-1, i} x {j-1, j}] with out-of-range taps
    contributing 0 — exactly torch ``grid_sample``'s zero-padded bilinear
    sample at half-integer coordinates (i-0.5, j-0.5)."""
    p = jnp.pad(pred, ((0, 0), (1, 0), (1, 0), (0, 0)))
    h, w = pred.shape[1], pred.shape[2]
    return 0.25 * (p[:, :h, :w] + p[:, :h, 1:] + p[:, 1:, :w] + p[:, 1:, 1:])


def unwarp_prediction_fast(
    pred: jnp.ndarray,
    task_idx: jnp.ndarray,
    valid: jnp.ndarray,
    num_iters: int | None = None,
    rounds: jnp.ndarray | None = None,
    gather_bf16: bool = False,
    gather_impl: str = "xla",
) -> jnp.ndarray:
    """Exact fast inverse warp for the reference's own inverse grid.

    The scatter-built grid_inv (core.grid.inverse_grid) always holds
    half-integer task coordinates (j/tw*2-1 unnormalizes to j-0.5), so the
    bilinear ``grid_sample(pred, grid_inv)`` is a 2x2 zero-padded average of
    ``pred`` indexed by the integer task index — one payload-carrying JFA and
    ONE row gather instead of a coordinate fill + 4-tap gather. Bit-exact
    (up to float rounding) with
    ``unwarp_prediction(pred, inverse_grid(...)...,'nearest')``.

    ``gather_bf16`` (TPU.scoremap_gather_bf16): round the half-pixel-averaged
    scores to bf16 before the row gather — measured -12.5% on the gather, the
    path's largest stage (benchmarks/gather_probe.py), at ~1.6e-2 abs error
    on unit-scale logits. Off by default to keep the bit-exactness contract.

    pred: [B, th, tw, C]; task_idx/valid from core.grid.inverse_grid_index.
    """
    b, th, tw, c = pred.shape
    hs, ws = task_idx.shape[1], task_idx.shape[2]
    tidx = _nearest_payload(valid, task_idx, num_iters, rounds,
                            pay_bits=(th * tw - 1).bit_length())  # [B, Hs, Ws]
    p2 = halfpixel_avg(pred).reshape(b, th * tw, c)
    if gather_impl == "windowed" and _use_pallas_jfa():
        from fovealseg_tpu.ops.pallas_gather import (
            windowed_gather_supported,
            windowed_row_gather,
        )

        if windowed_gather_supported(p2, tidx):
            # bit-exact windowed Pallas gather (lane-local take_along_axis
            # over a per-tile task-cell window; ops/pallas_gather.py) with
            # an in-graph whole-batch fallback to the XLA gather on warps
            # that compress too much — gather_bf16 is moot on this path
            out = windowed_row_gather(p2.astype(jnp.float32), tidx)
            return out.astype(pred.dtype)
    if gather_bf16:
        p2 = p2.astype(jnp.bfloat16)
    out = _gather_rows_flat(p2, tidx.reshape(b, hs * ws))
    return out.reshape(b, hs, ws, c).astype(pred.dtype)


def unwarp_argmax_fast(
    pred: jnp.ndarray,
    task_idx: jnp.ndarray,
    valid: jnp.ndarray,
    num_iters: int | None = None,
    rounds: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full-res argmax class map — exact argmax of ``unwarp_prediction_fast``.

    Because the fast inverse warp is a pure row gather of the task-space
    half-pixel average, argmax commutes with it: argmax(p2[tidx]) ==
    argmax(p2)[tidx]. So the argmax runs in task space ([B, th, tw, C], a few
    thousand pixels) and the full-res gather moves ONE int32 channel instead
    of C float channels — the metric surface (IoU / acc / dice / hd95 /
    trimap, all computed from argmax(pred_sampled) in the reference eval,
    /root/reference/eval.py:218-269) is unchanged.

    Returns [B, Hs, Ws] int32 class ids.
    """
    b, th, tw, _ = pred.shape
    hs, ws = task_idx.shape[1], task_idx.shape[2]
    tidx = _nearest_payload(valid, task_idx, num_iters, rounds,
                            pay_bits=(th * tw - 1).bit_length())
    cls2 = jnp.argmax(halfpixel_avg(pred), axis=-1).astype(jnp.int32)
    out = _gather_rows_flat(cls2.reshape(b, th * tw, 1), tidx.reshape(b, hs * ws))
    return out.reshape(b, hs, ws)


def unwarp_argmax_scatter(
    pred: jnp.ndarray,
    grid: jnp.ndarray,
    seg_hw: tuple[int, int],
    num_iters: int | None = None,
    rounds: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gather-free full-res argmax map: scatter class ids, JFA carries them.

    Identical output to ``unwarp_argmax_fast`` but without the 3.3M-row final
    gather (measured ~3x slower per row for 1-wide rows than 51-wide rows on
    TPU): the task-space argmax rides the inverse scatter as the low bits of
    a combined (flat_task_index * M + class) key — the scatter-max winner is
    decided by the task index exactly as in ``core.grid.inverse_grid_index``
    (M > num_class, strict task-index ties impossible) — and the payload JFA
    then propagates the class id itself. Total cost = one scatter + the JFA.

    pred: [B, th, tw, C]; grid: forward warp grid [B, th, tw, 2].
    Returns [B, Hs, Ws] int32 class ids.
    """
    from fovealseg_tpu.core.grid import landing_scatter_max

    b, th, tw, c = pred.shape
    m = 1 << max(1, (c - 1).bit_length())  # next pow2 > num_class - 1
    assert th * tw * m < 2**31, "combined scatter key overflows int32"
    cls2 = jnp.argmax(halfpixel_avg(pred), axis=-1).astype(jnp.int32)
    flat_task = jnp.broadcast_to(
        jnp.arange(th * tw, dtype=jnp.int32)[None], (b, th * tw)
    )
    combined = flat_task * m + cls2.reshape(b, th * tw)
    canvas = landing_scatter_max(grid, seg_hw, combined)
    valid = canvas >= 0
    cls_canvas = jnp.where(valid, canvas % m, 0)
    return _nearest_payload(valid, cls_canvas, num_iters, rounds,
                            cls_bits=m.bit_length() - 1)


def unwarp_labels_fast(
    labels: jnp.ndarray,
    task_idx: jnp.ndarray,
    valid: jnp.ndarray,
    num_iters: int | None = None,
    rounds: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Nearest label round-trip: each full-res pixel takes the label of the
    task pixel whose forward warp landed on it (holes adopt their nearest
    valid pixel's task index). The reference samples labels through grid_inv
    with ``grid_sample(mode='nearest')`` (models_instance.py:914); the inverse
    coords are exactly half-integer there, so torch's round-half-to-even picks
    a parity-dependent neighbor — here the integer task index is gathered
    directly (deterministic, no 4-tap label averaging).

    labels: [B, th, tw, C] (categorical values); task_idx/valid from
    core.grid.inverse_grid_index.
    """
    b, th, tw, c = labels.shape
    hs, ws = task_idx.shape[1], task_idx.shape[2]
    tidx = _nearest_payload(valid, task_idx, num_iters, rounds,
                            pay_bits=(th * tw - 1).bit_length())
    out = _gather_rows_flat(labels.reshape(b, th * tw, c), tidx.reshape(b, hs * ws))
    return out.reshape(b, hs, ws, c)


def fill_grid_nearest(
    grid_inv: jnp.ndarray, valid: jnp.ndarray, num_iters: int | None = None
) -> jnp.ndarray:
    """Replace NaN holes in [B,H,W,2] grid_inv with the nearest valid pixel's
    coordinates (single-gather fusion of inverse warp + nearest fill)."""
    b, h, w, _ = grid_inv.shape
    idx = _nearest_seed(valid, num_iters)
    out = _gather_rows_flat(grid_inv.reshape(b, h * w, 2), idx.reshape(b, h * w))
    return out.reshape(b, h, w, 2)


def fill_values_nearest(
    values: jnp.ndarray, valid: jnp.ndarray, num_iters: int | None = None
) -> jnp.ndarray:
    """Nearest-fill arbitrary per-pixel values [B,H,W,C] at hole pixels."""
    b, h, w, c = values.shape
    idx = _nearest_seed(valid, num_iters)
    out = _gather_rows_flat(values.reshape(b, h * w, c), idx.reshape(b, h * w))
    return out.reshape(b, h, w, c)


def fill_values_splat(
    values: jnp.ndarray,
    valid: jnp.ndarray,
    radius: int = 2,
    num_iters: int | None = None,
) -> jnp.ndarray:
    """Smooth fill ('BI'/'tri'-class): normalized Gaussian splat of valid
    values over a (2r+1)^2 window, falling back to nearest fill for pixels no
    valid value reaches. Differentiable w.r.t. ``values`` (like the
    reference's 'tri' Interp2D whose gradient flows through values only,
    interp2d.py:84-89)."""
    vf = valid.astype(values.dtype)[..., None]
    num = values * vf
    den = vf
    # separable box-of-gaussian accumulation via shifts (small static radius)
    sigma = max(radius / 1.5, 0.5)
    acc_n = jnp.zeros_like(num)
    acc_d = jnp.zeros_like(den)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            wgt = math.exp(-(dy * dy + dx * dx) / (2 * sigma * sigma))
            acc_n = acc_n + wgt * _shift2d(num, dy, dx)
            acc_d = acc_d + wgt * _shift2d(den, dy, dx)
    smooth = acc_n / jnp.maximum(acc_d, 1e-8)
    reached = acc_d[..., 0] > 1e-8
    far = fill_values_nearest(values * vf, valid, num_iters)
    out = jnp.where(reached[..., None], smooth, far)
    return jnp.where(valid[..., None], values, out)


def unwarp_prediction(
    pred: jnp.ndarray,
    grid_inv: jnp.ndarray,
    valid: jnp.ndarray,
    interp: str = "nearest",
    num_iters: int | None = None,
) -> jnp.ndarray:
    """Inverse-warp task-space prediction [B,h,w,C] to full resolution.

    interp='nearest': fused JFA + one gather (production path).
    interp in ('BI','tri'): gather at valid pixels then smooth value fill
    (matches the reference classes of fill to tolerance; the exact
    Delaunay-barycentric oracle lives in fovealseg_tpu.native).
    """
    grid_safe = jnp.where(jnp.isnan(grid_inv), 0.0, grid_inv)
    if interp == "nearest":
        # every hole adopts its nearest valid pixel's coordinates, then one
        # gather performs warp + fill together
        filled = fill_grid_nearest(grid_safe, valid, num_iters)
        return grid_sample(pred, filled)
    sampled = grid_sample(pred, grid_safe)
    sampled = sampled * valid[..., None].astype(sampled.dtype)
    return fill_values_splat(sampled, valid, num_iters=num_iters)
