"""Separable-conv deformed sampler vs a torch unfold oracle (nn_B0 spec)."""

import jax.numpy as jnp
import numpy as np
import torch

from fovealseg_tpu.core.deformed_sampler import (
    deformed_unsampler,
    gaussian_kernel_1d,
    get_grid,
    int_round_scale_grid,
)


def _oracle_grid(dm_np: np.ndarray, hs: int, ws: int, k: int) -> np.ndarray:
    """Direct torch implementation of the unfold-based Gaussian-window
    coordinate expectation (nn_B0_deformed_sampler.py:29-78)."""
    pad = k // 2
    dm = torch.from_numpy(dm_np)  # [B, 1, HS+2p, WS+2p]
    g1 = torch.from_numpy(gaussian_kernel_1d(k, sigma=k // 2).astype(np.float64))
    kern = (g1[:, None] * g1[None, :]).float()

    va = dm.unfold(-2, k, 1).unfold(-2, k, 1)  # [B,1,HS,WS,K,K]
    conv = va * kern[None, None, None, None]
    conv = (conv + 1e-6) / conv.add(1e-6).sum(dim=[-2, -1], keepdim=True)

    rows = torch.arange(hs + 2 * pad).float()[:, None].expand(hs + 2 * pad, ws + 2 * pad) - pad
    cols = torch.arange(ws + 2 * pad).float()[None, :].expand(hs + 2 * pad, ws + 2 * pad) - pad
    grid2 = torch.stack([rows, cols])  # [2, HP, WP]
    gu = grid2.unfold(-2, k, 1).unfold(-2, k, 1)[None]  # [1,2,HS,WS,K,K]
    e = torch.einsum("bphwkj,qthwkj->bthw", conv, gu)
    e[:, 0] /= hs - 1
    e[:, 1] /= ws - 1
    return (2.0 * e - 1.0).numpy()


def test_get_grid_matches_unfold_oracle(rng):
    hs = ws = 12
    k = 7
    pad = k // 2
    dm = rng.uniform(0, 1, (2, hs + 2 * pad, ws + 2 * pad, 1)).astype(np.float32)
    ours = np.asarray(get_grid(jnp.asarray(dm), (hs, ws), kernel_size=k))
    ref = _oracle_grid(dm.transpose(0, 3, 1, 2).astype(np.float32), hs, ws, k)
    ref_hwc = np.moveaxis(ref, 1, -1)
    np.testing.assert_allclose(ours, ref_hwc, rtol=1e-4, atol=1e-5)


def test_int_round_scale_grid():
    g = jnp.asarray([[[[-1.0, 1.0], [0.0, 0.0]]]])  # [1,1,2,2]
    out = np.asarray(int_round_scale_grid(g, (11, 21)))
    assert out[0, 0, 0].tolist() == [0, 20]
    assert out[0, 0, 1].tolist() == [5, 10]


def test_deformed_unsampler_fills_canvas(rng):
    labels = rng.uniform(0, 1, (1, 6, 6, 3)).astype(np.float32)
    ig = rng.integers(0, 16, (1, 6, 6, 2)).astype(np.int32)
    out = np.asarray(deformed_unsampler(jnp.asarray(labels), jnp.asarray(ig), (16, 16)))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()
    # every canvas value must appear among the scattered labels (last-write
    # collisions allowed) — nearest fill copies existing values only
    vals = set(np.round(labels.reshape(-1, 3)[:, 0], 5))
    for v in np.round(out[0, :, :, 0].reshape(-1), 5):
        assert v in vals
