"""Plain (non-deform) segmentation module.

Rebuild of ``SegmentationModule`` (/root/reference/models/models.py:1097-1144):
encoder -> decoder wrapper used by the legacy eval path (eval.py:524) and for
non-foveated baselines. Training returns (loss, acc) against integer labels;
inference returns class probabilities optionally resized to ``seg_hw``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_bilinear


class SegmentationModule(nn.Module):
    config: Any  # DeformConfig (arch/num_class/fc_dim are used)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        from fovealseg_tpu.models.builder import build_decoder, build_encoder

        c = self.config
        self.encoder = build_encoder(c.arch_encoder, c.fc_dim, self.axis_name, self.dtype)
        self.decoder = build_decoder(c.arch_decoder, c.fc_dim, c.num_class, self.axis_name, self.dtype)

    def __call__(self, x, train: bool = False):
        """x [B, H, W, 3] -> logits [B, h, w, C]."""
        return self.decoder(self.encoder(x, train=train), train=train)

    def infer(self, x, seg_hw: tuple[int, int] | None = None):
        logits = self(x, train=False).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        if seg_hw is not None and seg_hw != logits.shape[1:3]:
            probs = resize_bilinear(probs, seg_hw)
        return probs
