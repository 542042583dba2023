"""DeepLabV3-ResNet101 encoder rewired to 960 output channels.

Rebuild of ``CustomDeepLab`` (/root/reference/models/deeplab.py:11-49,
factory 420-426): torchvision ``deeplabv3_resnet101`` (ResNet-101 backbone,
output-stride 8 via dilation in layers 3/4, ASPP head with rates 12/24/36)
whose classifier tail is rewired ``256 -> 512 -> num_classes=960`` so the
module serves as a 960-channel *encoder* feeding the shared C1 decoder; the
output is bilinearly upsampled to the input resolution (torchvision
DeepLabV3.forward semantics).

Module names mirror the torchvision state_dict (prefixed ``deeplab.`` as in
the reference wrapper) for checkpoint import.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_bilinear
from fovealseg_tpu.models.layers import batch_norm, conv2d

RESNET101_LAYERS = (3, 4, 23, 3)


def _dilated_conv(features, kernel, stride, dilation, name, dtype):
    pad = dilation if kernel == 3 else 0
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
        dtype=dtype,
        name=name,
    )


class TVBottleneck(nn.Module):
    """torchvision ResNet Bottleneck (conv1 1x1 / conv2 3x3 / conv3 1x1)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 1, 1, 0, use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = batch_norm("bn1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = _dilated_conv(self.planes, 3, self.stride, self.dilation, "conv2", self.dtype)(out)
        out = batch_norm("bn2", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes * 4, 1, 1, 0, use_bias=False, name="conv3", dtype=self.dtype)(out)
        out = batch_norm("bn3", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes * 4, 1, self.stride, 0, use_bias=False, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class ResNet101OS8(nn.Module):
    """ResNet-101 with replace_stride_with_dilation=[False, True, True]."""

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    layers: tuple = RESNET101_LAYERS  # reducible for fast tests

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
                    kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                    dtype=self.dtype, name="conv1")(x)
        x = batch_norm("bn1", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        dilation = 1
        for li, (planes, blocks, stride, dilate) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2), (False, False, True, True))
        ):
            prev_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for b in range(blocks):
                s = stride if b == 0 else 1
                d = prev_dilation if b == 0 else dilation
                ds = b == 0 and (s != 1 or inplanes != planes * 4)
                x = TVBottleneck(planes, s, d, ds, self.axis_name, self.dtype,
                                 name=f"layer{li + 1}.{b}")(x, train)
                inplanes = planes * 4
        return x


class ASPP(nn.Module):
    """torchvision ASPP head: 1x1 + atrous 12/24/36 + image pooling -> 256."""

    rates: tuple = (12, 24, 36)
    out_ch: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    drop_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = []
        b0 = conv2d(self.out_ch, 1, 1, 0, use_bias=False, name="convs.0.0", dtype=self.dtype)(x)
        b0 = batch_norm("convs.0.1", self.axis_name, train, self.dtype)(b0)
        branches.append(nn.relu(b0))
        for i, r in enumerate(self.rates):
            b = _dilated_conv(self.out_ch, 3, 1, r, f"convs.{i + 1}.0", self.dtype)(x)
            b = batch_norm(f"convs.{i + 1}.1", self.axis_name, train, self.dtype)(b)
            branches.append(nn.relu(b))
        # image-level pooling branch
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = conv2d(self.out_ch, 1, 1, 0, use_bias=False, name="convs.4.1", dtype=self.dtype)(gp)
        gp = batch_norm("convs.4.2", self.axis_name, train, self.dtype)(gp)
        gp = nn.relu(gp)
        gp = jnp.broadcast_to(gp, branches[0].shape[:3] + (self.out_ch,))
        branches.append(gp)

        cat = jnp.concatenate(branches, axis=-1)
        out = conv2d(self.out_ch, 1, 1, 0, use_bias=False, name="project.0", dtype=self.dtype)(cat)
        out = batch_norm("project.1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        return nn.Dropout(self.drop_rate, deterministic=not train, name="project.3")(out)


class DeepLabEncoder(nn.Module):
    """CustomDeepLab: backbone + ASPP + rewired 256->512->960 tail."""

    num_classes: int = 960
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    layers: tuple = RESNET101_LAYERS

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        layers = self.layers

        class _Wrap(nn.Module):
            axis_name: Optional[str]
            dtype: Any
            num_classes: int

            @nn.compact
            def __call__(self, x, train):
                feat = ResNet101OS8(self.axis_name, self.dtype, layers, name="backbone")(x, train)
                y = ASPP(axis_name=self.axis_name, dtype=self.dtype, name="classifier.0")(feat, train)
                y = conv2d(512, 1, 1, 0, name="classifier.1", dtype=self.dtype)(y)
                y = batch_norm("classifier.2", self.axis_name, train, self.dtype)(y)
                y = nn.relu(y)
                return conv2d(self.num_classes, 1, 1, 0, name="classifier.4", dtype=self.dtype)(y)

        out = _Wrap(self.axis_name, self.dtype, self.num_classes, name="deeplab")(x, train)
        out = resize_bilinear(out.astype(jnp.float32), (h, w)).astype(self.dtype)
        return [out]
