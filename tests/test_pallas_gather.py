"""Windowed Pallas row gather (ops/pallas_gather.py): exactness, fallback,
and the unwarp_prediction_fast / TPU.scoremap_gather threading.

Interpret-mode on the CPU suite; the on-TPU lowering is covered by
bench.py's pallas_exactness_guard extension and benchmarks/wingather_probe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.ops.pallas_gather import (
    windowed_gather_supported,
    windowed_row_gather,
)

B, H, W, T, C = 2, 256, 256, 1024, 11


def _warp_idx(rng, b, h, w, t):
    """Monotone foveated warp index field (the JFA output's locality)."""
    side = int(np.sqrt(t))
    idxs = []
    for _ in range(b):
        g = rng.uniform(0.2, 0.8, 2)
        wy = 1.0 / (np.abs(np.linspace(0, 1, h) - g[0]) + 0.08)
        wx = 1.0 / (np.abs(np.linspace(0, 1, w) - g[1]) + 0.08)
        ty = np.clip((np.cumsum(wy) / wy.sum() * (side - 1e-3)).astype(np.int64), 0, side - 1)
        tx = np.clip((np.cumsum(wx) / wx.sum() * (side - 1e-3)).astype(np.int64), 0, side - 1)
        idxs.append(ty[:, None] * side + tx[None, :])
    return np.stack(idxs).astype(np.int32)


def _ref(vals, idx):
    b, t, c = vals.shape
    return np.take_along_axis(
        vals, idx.reshape(b, -1, 1).astype(np.int64), axis=1
    ).reshape(b, idx.shape[1], idx.shape[2], c)


def test_windowed_gather_bit_exact_on_warp_idx():
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((B, T, C)).astype(np.float32)
    idx = _warp_idx(rng, B, H, W, T)
    out = windowed_row_gather(jnp.asarray(vals), jnp.asarray(idx), interpret=True)
    assert np.array_equal(np.asarray(out), _ref(vals, idx))


def test_windowed_gather_fallback_exact_on_random_idx():
    # random indices blow every tile window -> the lax.cond fallback runs
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((B, T, C)).astype(np.float32)
    idx = rng.integers(0, T, (B, H, W)).astype(np.int32)
    out = windowed_row_gather(jnp.asarray(vals), jnp.asarray(idx), interpret=True)
    assert np.array_equal(np.asarray(out), _ref(vals, idx))


def test_supported_gate():
    ok = jnp.zeros((1, 1024, 8), jnp.float32)
    assert windowed_gather_supported(ok, jnp.zeros((1, 64, 128), jnp.int32))
    # unaligned T / canvas width / too-small table all refuse
    assert not windowed_gather_supported(
        jnp.zeros((1, 1000, 8), jnp.float32), jnp.zeros((1, 64, 128), jnp.int32))
    assert not windowed_gather_supported(ok, jnp.zeros((1, 64, 120), jnp.int32))
    assert not windowed_gather_supported(
        jnp.zeros((1, 256, 8), jnp.float32), jnp.zeros((1, 64, 128), jnp.int32))


def test_unwarp_fast_windowed_matches_xla():
    """unwarp_prediction_fast(gather_impl='windowed') == the default path.

    On CPU the pallas dispatch gate refuses (not TPU), so this pins that the
    knob is a no-op off-TPU; the shape gate + kernel exactness above cover
    the on-TPU behavior."""
    from fovealseg_tpu.core.unwarp import unwarp_prediction_fast

    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    ti = rng.integers(0, 64, (1, 32, 32)).astype(np.int32)
    valid = np.zeros((1, 32, 32), bool)
    valid[:, ::4, ::4] = True
    a = unwarp_prediction_fast(pred, jnp.asarray(ti), jnp.asarray(valid))
    b = unwarp_prediction_fast(
        pred, jnp.asarray(ti), jnp.asarray(valid), gather_impl="windowed"
    )
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_deform_config_threads_scoremap_gather():
    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.models.deform_module import DeformConfig

    cfg = get_default_cfg()
    assert cfg.TPU.scoremap_gather == "xla"
    cfg.TPU.scoremap_gather = "windowed"
    dc = DeformConfig.from_cfg(cfg)
    assert dc.scoremap_gather == "windowed"
