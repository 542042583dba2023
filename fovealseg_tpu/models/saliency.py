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
import jax
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


class _BatchStatsNorm(nn.Module):
    """torch ``BatchNorm2d(track_running_stats=False)``: normalize with the
    CURRENT batch statistics in both train and eval, learned scale/bias, and
    NO running-stats collection (so plain ``apply`` without mutable
    collections works on every eval path)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


def _zoom_bn(name: str, axis_name, train: bool, dtype, nonsyn: bool):
    """BN flavor selector: the *_nonsyn variants use torch BatchNorm2d with
    ``track_running_stats=False`` (saliency_network.py:218,269-282), which
    normalizes with BATCH statistics even in eval — modeled as a stats-free
    norm module (no batch_stats collection, eval-safe)."""
    if nonsyn:
        return _BatchStatsNorm(dtype=dtype, name=name)
    return batch_norm(name, axis_name, train, dtype)


class _ZoomBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    nonsyn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = _zoom_bn("bn1", self.axis_name, train, self.dtype, self.nonsyn)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = _zoom_bn("bn2", self.axis_name, train, self.dtype, self.nonsyn)(out)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, self.stride, 0, use_bias=False, name="downsample.0", dtype=self.dtype)(x)
            residual = _zoom_bn("downsample.1", self.axis_name, train, self.dtype, self.nonsyn)(residual)
        return nn.relu(out + residual)


class ResNetZoom(nn.Module):
    """ResNet-18/10-style saliency trunk (saliency_network.py:98-331).

    * ``stride1`` keeps the stem conv AND maxpool at stride 1
      (ResNetZoom_Stride1, saliency_network.py:98-152 — the 3x3 maxpool stays,
      just without downsampling).
    * ``nonsyn`` uses track_running_stats=False BN (batch stats always).
    * forward runs layer1..layer3 only (layer4/avgpool/fc are built but dead
      in the reference forward, saliency_network.py:141-152); the torch
      checkpoint import is strict=False so their keys are ignored.
    Output is the 256-ch stage-3 feature map (fed to CompressNet(256)).
    """

    layers: tuple = (2, 2, 2, 2)
    stride1: bool = False
    nonsyn: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_stride = 1 if self.stride1 else 2
        x = conv2d(64, 7, stem_stride, 3, use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = _zoom_bn("bn1", self.axis_name, train, self.dtype, self.nonsyn)(x)
        x = nn.relu(x)
        pool_stride = 1 if self.stride1 else 2
        x = nn.max_pool(x, (3, 3), strides=(pool_stride, pool_stride), padding=((1, 1), (1, 1)))

        # ResNetZoom_Stride1 keeps EVERY stage at stride 1 (layer2/3 built
        # with stride=1, saliency_network.py:108-111), not just the stem
        stage_strides = (1, 1, 1) if self.stride1 else (1, 2, 2)
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256), self.layers[:3], stage_strides)
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_ds = s != 1 or inplanes != planes
                x = _ZoomBasicBlock(
                    planes, s, needs_ds, self.axis_name, self.dtype, self.nonsyn,
                    name=f"layer{li + 1}.{b}",
                )(x, train)
                inplanes = planes
        return x


def build_saliency(name: str, axis_name=None, dtype=jnp.float32):
    """Registry mirroring build_net_saliency (models/models.py:1211-1224)."""
    if name == "fovsimple":
        return FovSimModule(axis_name=axis_name, dtype=dtype)
    if name == "resnet18":
        return ResNetZoom((2, 2, 2, 2), False, False, axis_name, dtype)
    if name == "resnet18_nonsyn":
        return ResNetZoom((2, 2, 2, 2), False, True, axis_name, dtype)
    if name == "resnet18_stride1":
        return ResNetZoom((2, 2, 2, 2), True, False, axis_name, dtype)
    if name == "resnet10_nonsyn":
        return ResNetZoom((1, 1, 1, 1), False, True, axis_name, dtype)
    raise ValueError(f"Unknown saliency net: {name}")
