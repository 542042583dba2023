"""Plain (non-deform) segmentation module.

Rebuild of ``SegmentationModule`` (/root/reference/models/models.py:1097-1144):
encoder -> decoder wrapper used by the legacy eval path (eval.py:524) and for
non-foveated baselines. Training returns the decoder output (a
``(pred, pred_deepsup)`` tuple for deep-supervision decoders — C1DeepSup /
PPMDeepsup, models/legacy_decoders.py); ``deep_sup_loss`` combines the two
criterion terms with ``deep_sup_scale`` exactly as the reference
(models/models.py:1117-1121). Inference returns class probabilities
optionally resized to ``seg_hw``. The reference's ``VAL.write_pred`` TB dump
is CLI-side here (cli/eval.py visual surface; palette via utils/ade.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_bilinear


def deep_sup_loss(crit, preds, label, deep_sup_scale: float):
    """loss = crit(pred) + deep_sup_scale * crit(pred_deepsup)
    (models/models.py:1117-1121)."""
    pred, pred_deepsup = preds
    return crit(pred, label) + deep_sup_scale * crit(pred_deepsup, label)


class SegmentationModule(nn.Module):
    config: Any  # DeformConfig (arch/num_class/fc_dim are used)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    # explicit decoder module (the reference passes net_dec in directly, so
    # deep-supervision decoders that the builder rejects are usable here)
    decoder_module: Optional[nn.Module] = None

    def setup(self):
        from fovealseg_tpu.models.builder import build_decoder, build_encoder

        c = self.config
        self.encoder = build_encoder(c.arch_encoder, c.fc_dim, self.axis_name, self.dtype)
        if self.decoder_module is not None:
            self.decoder = self.decoder_module
        else:
            self.decoder = build_decoder(c.arch_decoder, c.fc_dim, c.num_class, self.axis_name, self.dtype)

    def __call__(self, x, train: bool = False):
        """x [B, H, W, 3] -> logits [B, h, w, C] (or a deep-sup tuple)."""
        return self.decoder(self.encoder(x, train=train), train=train)

    def infer(self, x, seg_hw: tuple[int, int] | None = None):
        logits = self(x, train=False)
        if isinstance(logits, tuple):
            logits = logits[0]
        logits = logits.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        if seg_hw is not None and seg_hw != logits.shape[1:3]:
            probs = resize_bilinear(probs, seg_hw)
        return probs
