"""Saliency ("foveater") networks and the compress head.

* FovSimModule — 3-conv saliency CNN (5ch gaze-conditioned input -> 24ch),
  ReLU6, BN: /root/reference/saliency_network.py:302-333 (``fov_simple``:325).
* CompressNet — ReLU + 1x1 conv 24->1 scalar saliency:
  /root/reference/models/models.py:360-372.
* ResNetZoom saliency variants (resnet18 / stride1 / nonsyn / resnet10):
  /root/reference/saliency_network.py:98-373 — standard BasicBlock ResNets
  with a zoom head; provided for build-surface parity.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.models.layers import batch_norm, conv2d, relu6


class FovSimModule(nn.Module):
    """fov_simple: expand(5->8*out) -> expand -> squeeze(->out), ReLU6+BN."""

    out_channels: int = 24
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = 8 * self.out_channels
        x = conv2d(c, 3, 1, 1, use_bias=False, name="fov_expand_1", dtype=self.dtype)(x)
        x = batch_norm("norm1", self.axis_name, train, self.dtype)(x)
        x = relu6(x)
        x = conv2d(c, 3, 1, 1, use_bias=False, name="fov_expand_2", dtype=self.dtype)(x)
        x = batch_norm("norm2", self.axis_name, train, self.dtype)(x)
        x = relu6(x)
        x = conv2d(self.out_channels, 3, 1, 1, use_bias=False, name="fov_squeeze_1", dtype=self.dtype)(x)
        x = batch_norm("norm3", self.axis_name, train, self.dtype)(x)
        return x


class CompressNet(nn.Module):
    """ReLU then 1x1 conv to a scalar saliency channel."""

    in_channels: int = 24  # 24 for fovsimple, 256 for resnet saliency nets
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        return conv2d(1, 1, 1, 0, name="conv_last", dtype=self.dtype)(x)


class _ZoomBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = batch_norm("bn1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = batch_norm("bn2", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, self.stride, 0, use_bias=False, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class ResNetZoom(nn.Module):
    """ResNet-18/10-style saliency trunk (saliency_network.py:98-295).

    ``stride1`` keeps the stem at stride 1 (saliency_network_resnet18_stride1).
    Output is the 256-ch stage-3 feature map (fed to CompressNet(256)).
    """

    layers: tuple = (2, 2, 2, 2)
    stride1: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_stride = 1 if self.stride1 else 2
        x = conv2d(64, 7, stem_stride, 3, use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = batch_norm("bn1", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)
        if not self.stride1:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256), self.layers[:3], (1, 2, 2))
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = s != 1 or inplanes != planes
                x = _ZoomBasicBlock(
                    planes, s, needs_ds, self.axis_name, self.dtype,
                    name=f"layer{li + 1}.{b}",
                )(x, train)
                inplanes = planes
        return x


def build_saliency(name: str, axis_name=None, dtype=jnp.float32):
    """Registry mirroring build_net_saliency (models/models.py:1211-1224)."""
    if name == "fovsimple":
        return FovSimModule(axis_name=axis_name, dtype=dtype)
    if name in ("resnet18", "resnet18_nonsyn"):
        return ResNetZoom((2, 2, 2, 2), False, axis_name, dtype)
    if name == "resnet18_stride1":
        return ResNetZoom((2, 2, 2, 2), True, axis_name, dtype)
    if name == "resnet10_nonsyn":
        return ResNetZoom((1, 1, 1, 1), False, axis_name, dtype)
    raise ValueError(f"Unknown saliency net: {name}")
