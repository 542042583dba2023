"""C1 decoder (modified, instance-style) + classification ResNet head.

Mirror of /root/reference/models/model_utils.py:224-310:

* ``cbr``: conv3x3-BN-ReLU (fc_dim -> fc_dim/4), then 1x1 conv to a single
  mask logit; mask activation = ``sigmoid(x) - 0.5`` in [-0.5, 0.5].
* ``cls_net``: 2 ResidualBlocks (fc_dim->512 stride 4, 512->512 stride 2),
  10x10 average pool, FC -> num_class logits.
* Output: class logits broadcast over HxW with the background (last) channel
  modulated by the mask: ``out[..., -1] = cls[..., -1] * mask``.

Deviation (documented): the reference's fixed ``AvgPool2d((10,10), stride=1)``
only type-checks when the post-stride feature map is exactly 10x10 (i.e. an
80x80 task input); we use a global mean pool, which is identical there and
well-defined for other task sizes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.models.layers import batch_norm, conv2d, linear


class ResidualBlock(nn.Module):
    """model_utils.py:224-246 (convs have torch-default bias=True)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 3, self.stride, 1, name="conv1.0", dtype=self.dtype)(x)
        out = batch_norm("conv1.1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, name="conv2.0", dtype=self.dtype)(out)
        out = batch_norm("conv2.1", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, self.stride, 0, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class ClsResNet(nn.Module):
    """cls_net (model_utils.py:248-275): fc_dim -> 512 (s4) -> 512 (s2) -> FC."""

    num_class: int = 51
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResidualBlock(512, 4, True, self.axis_name, self.dtype, name="layer2.0")(x, train)
        x = ResidualBlock(512, 2, True, self.axis_name, self.dtype, name="layer3.0")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global pool == AvgPool2d(10) on 10x10
        return linear(self.num_class, name="fc", dtype=self.dtype)(x)


class C1(nn.Module):
    """Mask+class decoder; returns [B, H, W, num_class] logits (NHWC)."""

    num_class: int = 51
    fc_dim: int = 960
    use_softmax: bool = False  # kept for build-surface parity (unused in the
    # modified C1 forward, model_utils.py:289-310)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, train: bool = False):
        conv5 = conv_out[-1] if isinstance(conv_out, (list, tuple)) else conv_out
        x = conv2d(self.fc_dim // 4, 3, 1, 1, use_bias=False, name="cbr.0", dtype=self.dtype)(conv5)
        x = batch_norm("cbr.1", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)
        x = conv2d(1, 1, 1, 0, name="conv_last", dtype=self.dtype)(x)
        mask = nn.sigmoid(x.astype(jnp.float32)) - 0.5  # [B, H, W, 1]

        cls_pred = ClsResNet(self.num_class, self.axis_name, self.dtype, name="cls_net")(conv5, train)
        b = cls_pred.shape[0]
        h, w = mask.shape[1], mask.shape[2]
        cls_map = jnp.broadcast_to(cls_pred[:, None, None, :], (b, h, w, self.num_class))
        bg = cls_map[..., -1:] * mask
        return jnp.concatenate([cls_map[..., :-1], bg], axis=-1)
