"""PIL-style edge-target chain vs PIL oracles."""

import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageFilter

from fovealseg_tpu.core.edges import edge_target_pil_style, gaussian_blur, pil_find_edges


def test_find_edges_exact_vs_pil(rng):
    u8 = rng.integers(0, 256, (2, 16, 20)).astype(np.uint8)
    ours = np.asarray(pil_find_edges(jnp.asarray(u8 / 255.0)[..., None]))[..., 0]
    for b in range(2):
        ref = np.asarray(Image.fromarray(u8[b], "L").filter(ImageFilter.FIND_EDGES))
        np.testing.assert_array_equal(np.round(ours[b] * 255).astype(np.uint8), ref)


def test_gaussian_blur_preserves_mass(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
    y = gaussian_blur(x, radius=2.0)
    # interior mass approximately preserved; smoothing reduces variance
    assert float(jnp.std(y)) < float(jnp.std(x))
    assert abs(float(jnp.mean(y)) - float(jnp.mean(x))) < 0.02


def test_edge_target_chain_highlights_boundaries(rng):
    y = np.zeros((1, 64, 64), np.float32)
    y[0, 16:48, 16:48] = 1.0
    t = np.asarray(edge_target_pil_style(jnp.asarray(y), (32, 32), (32, 32),
                                          blur_radius=1.0))[0, :, :, 0]
    # boundary band has much higher response than the flat regions
    boundary = t[7:10, 7:26].mean()
    flat_in = t[14:18, 14:18].mean()
    flat_out = t[1:4, 1:4].mean()
    assert boundary > 5 * max(flat_in, 1e-6)
    assert boundary > 5 * max(flat_out, 1e-6)


def test_edge_target_softmax_and_zero_bound(rng):
    y = rng.uniform(0, 1, (2, 32, 32)).astype(np.float32)
    t = np.asarray(edge_target_pil_style(jnp.asarray(y), (16, 16), (16, 16),
                                          softmax=True, zero_bound=1))
    # zero bound kills the border
    assert (t[:, 0] == 0).all() and (t[:, -1] == 0).all()
