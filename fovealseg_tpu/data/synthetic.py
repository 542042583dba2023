"""Synthetic LVIS-shaped data for tests/benchmarks.

Generates batches with the cooked-dataset contract
(/root/reference/DynamicFocus/e_preprocess_scripts/dataset.py:118-142):
RGB image on a (canvas x canvas) canvas in [0,1], a gaze point inside the
instance mask normalized by the canvas size, a binary instance mask, and a
foreground class id in [0, num_fg_class).
"""

from __future__ import annotations

import numpy as np


def make_batch_device(key, batch: int = 2, canvas: int = 640, num_fg_class: int = 50):
    """jax-native twin of :func:`make_batch` — generates the batch ON DEVICE
    (jit-able), so training/eval loops never pay a host->device copy. Same
    contract: random ellipse instance, brightened by +0.3 so there is signal,
    gaze point uniform inside the ellipse (polar sqrt sampling), class id in
    [0, num_fg_class). Different pseudorandom stream than the numpy twin.
    """
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 6)
    c = jax.random.uniform(ks[0], (batch, 2), minval=canvas / 4, maxval=3 * canvas / 4)
    r = jax.random.uniform(ks[1], (batch, 2), minval=canvas / 16, maxval=canvas / 6)
    imgs = jax.random.uniform(ks[2], (batch, canvas, canvas, 3), jnp.float32)
    cls = jax.random.randint(ks[3], (batch,), 0, num_fg_class, jnp.int32)

    yy = jnp.arange(canvas, dtype=jnp.float32)[None, :, None]  # [1,H,1]
    xx = jnp.arange(canvas, dtype=jnp.float32)[None, None, :]  # [1,1,W]
    cy, cx = c[:, 0, None, None], c[:, 1, None, None]
    ry, rx = r[:, 0, None, None], r[:, 1, None, None]
    inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0  # [B,H,W]
    masks = inside.astype(jnp.float32)
    # class identity is encoded in the instance's hue (cosine palette: three
    # phases 120 deg apart, distinct per class, channel-mean exactly 0.5) so
    # classification is *learnable* from pixels — a random class id on a
    # class-agnostic blob would make the C1 cls head an unlearnable target
    hue = cls.astype(jnp.float32) / num_fg_class
    phase = hue[:, None] + jnp.asarray([0.0, 1.0 / 3.0, 2.0 / 3.0])[None, :]
    color = 0.5 + 0.5 * jnp.cos(2.0 * jnp.pi * phase)  # [B,3]
    m = masks[..., None]
    fg = 0.3 * imgs + 0.7 * color[:, None, None, :] + 0.15
    imgs = jnp.clip(jnp.where(m > 0, fg, imgs), 0.0, 1.0)

    # uniform point inside the ellipse: center + s * (ry cos a, rx sin a);
    # s is shrunk so the point stays inside even after rounding to the pixel
    # grid (a 1-px shift moves the normalized radius by <= 1/min(ry,rx))
    t = jax.random.uniform(ks[4], (batch,))
    a = jax.random.uniform(ks[5], (batch,), minval=0.0, maxval=2 * jnp.pi)
    s = jnp.sqrt(t) * jnp.maximum(1.0 - 1.5 / jnp.min(r, axis=1), 0.0)
    fy = c[:, 0] + s * r[:, 0] * jnp.cos(a)
    fx = c[:, 1] + s * r[:, 1] * jnp.sin(a)
    focus = jnp.stack([fy, fx], axis=1) / canvas

    return {
        "img_data": imgs,
        "focus_point": focus.astype(jnp.float32),
        "seg_label": masks,
        "cls_label": cls,
    }


def make_batch(
    rng: np.random.Generator,
    batch: int = 2,
    canvas: int = 640,
    num_fg_class: int = 50,
) -> dict:
    """Returns dict(img_data [B,H,W,3], focus_point [B,2], seg_label [B,H,W],
    cls_label [B]) as float32/int32 numpy arrays (NHWC)."""
    imgs = rng.uniform(0.0, 1.0, (batch, canvas, canvas, 3)).astype(np.float32)
    masks = np.zeros((batch, canvas, canvas), dtype=np.float32)
    focus = np.zeros((batch, 2), dtype=np.float32)
    cls = rng.integers(0, num_fg_class, (batch,)).astype(np.int32)

    for b in range(batch):
        # random ellipse instance
        cy, cx = rng.integers(canvas // 4, 3 * canvas // 4, 2)
        ry, rx = rng.integers(canvas // 16, canvas // 6, 2)
        yy, xx = np.mgrid[0:canvas, 0:canvas]
        inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        masks[b][inside] = 1.0
        # brighten the instance so there is signal to segment
        imgs[b][inside] = np.clip(imgs[b][inside] + 0.3, 0, 1)
        ys, xs = np.nonzero(inside)
        k = rng.integers(0, len(ys))
        focus[b] = (ys[k] / canvas, xs[k] / canvas)

    return {
        "img_data": imgs,
        "focus_point": focus,
        "seg_label": masks,
        "cls_label": cls,
    }
