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
    # fully vectorized across the batch: the original per-sample
    # np.mgrid + boolean-index + np.nonzero loop cost ~19 ms/sample on a
    # 1-core host (~300 ms/b16 — 2/3 of the host side of the input
    # pipeline, benchmarks/input_pipeline.py); this form is ~5x faster with
    # the same output contract (random ellipse instance, +0.3 brightened,
    # gaze pixel strictly inside the mask)
    imgs = rng.random((batch, canvas, canvas, 3), dtype=np.float32)
    cls = rng.integers(0, num_fg_class, (batch,)).astype(np.int32)
    c = rng.integers(canvas // 4, 3 * canvas // 4, (batch, 2)).astype(np.float32)
    r = rng.integers(canvas // 16, canvas // 6, (batch, 2)).astype(np.float32)

    yy = np.arange(canvas, dtype=np.float32)[None, :, None]
    xx = np.arange(canvas, dtype=np.float32)[None, None, :]
    cy, cx = c[:, 0, None, None], c[:, 1, None, None]
    ry, rx = r[:, 0, None, None], r[:, 1, None, None]
    inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    masks = inside.astype(np.float32)
    # boolean-index update: instances cover a few % of the canvas, and a
    # broadcast `clip(imgs + 0.3*mask[...,None])` measures 370 ms/b16 on
    # this host (stride-0 channel broadcast) vs ~15 ms for the sparse form
    imgs[inside] = np.clip(imgs[inside] + 0.3, 0.0, 1.0)

    # uniform point inside the ellipse (polar sqrt sampling), radius shrunk
    # so pixel rounding cannot push it outside — replaces the per-sample
    # np.nonzero scan; the gaze-in-mask property is preserved exactly
    t = rng.random(batch)
    a = rng.random(batch) * 2.0 * np.pi
    s = np.sqrt(t) * np.maximum(1.0 - 1.5 / r.min(axis=1), 0.0)
    fy = np.rint(c[:, 0] + s * r[:, 0] * np.cos(a))
    fx = np.rint(c[:, 1] + s * r[:, 1] * np.sin(a))
    focus = np.stack([fy, fx], axis=1).astype(np.float32) / canvas

    return {
        "img_data": imgs,
        "focus_point": focus,
        "seg_label": masks,
        "cls_label": cls,
    }
