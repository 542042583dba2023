"""Stock backbones + dilated feature-extractor wrappers (legacy inventory).

Rebuild of the reference's stock-backbone inventory — MIT-stem ResNet
(/root/reference/models/resnet.py:95-160), ResNeXt-101
(resnext.py:23-127), MobileNetV2 (mobilenet.py:22-143) — and the
feature-extractor wrappers ``Resnet`` / ``ResnetDilated`` /
``MobileNetV2Dilated`` (model_utils.py:16-186). Like the legacy decoders,
none of these are reachable from the reference's ``ModelBuilder`` (its
``build_encoder`` raises for every arch except hrnetv2_nodownsp / segformer /
deeplab — behavior our builder keeps); they live in their own registry for
inventory parity and reuse with the legacy decoders (PPM/UPerNet).

Dilation surgery (`_nostride_dilate`, model_utils.py:85-113) is expressed
declaratively: a conv that originally had stride 2 becomes stride 1 with
dilation ``dilate//2``; every other 3x3 conv in the dilated stage gets
dilation ``dilate`` (1x1 convs, incl. the downsample, only lose the stride).

Torch-compatible child naming throughout (conv1/bn1/layer1.0...,
features.{i}.conv.{j}) so the checkpoint import shim applies unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.models.layers import batch_norm, conv2d, relu6


def _dilated_conv3x3(planes, stride, dilation, name, dtype):
    return nn.Conv(
        planes, (3, 3), strides=(stride, stride),
        padding=((dilation, dilation), (dilation, dilation)),
        kernel_dilation=(dilation, dilation), use_bias=False,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        dtype=dtype, name=name,
    )


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dil1: int = 1  # conv1 dilation (dilate//2 when it carried the stride)
    dil2: int = 1  # conv2 dilation
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _dilated_conv3x3(self.planes, self.stride, self.dil1, "conv1", self.dtype)(x)
        out = batch_norm("bn1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = _dilated_conv3x3(self.planes, 1, self.dil2, "conv2", self.dtype)(out)
        out = batch_norm("bn2", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                              name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dil2: int = 1  # the 3x3 conv's dilation
    groups: int = 1  # >1 = ResNeXt GroupBottleneck (expansion 2)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def expansion(self) -> int:
        return 2 if self.groups > 1 else 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 1, 1, 0, use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = batch_norm("bn1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((self.dil2, self.dil2), (self.dil2, self.dil2)),
            kernel_dilation=(self.dil2, self.dil2),
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = batch_norm("bn2", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes * self.expansion, 1, 1, 0, use_bias=False,
                     name="conv3", dtype=self.dtype)(out)
        out = batch_norm("bn3", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes * self.expansion, 1, self.stride, 0,
                              use_bias=False, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class MITResNet(nn.Module):
    """MIT-scene-parsing ResNet/ResNeXt trunk as a feature extractor.

    Combines the stock net (3-conv stem, resnet.py:95-160 / resnext.py:62-127)
    with the ``Resnet``/``ResnetDilated`` wrapper forward
    (model_utils.py:36-115): returns the [layer1..layer4] pyramid
    (``return_feature_maps=True``) or ``[layer4]``.

    ``dilate_scale`` in {0 (off), 8, 16} applies the _nostride_dilate surgery
    to layer3/layer4 (8) or layer4 (16).
    """

    block: str = "bottleneck"  # "basic" | "bottleneck" | "group"
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    dilate_scale: int = 0
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_maps: bool = True):
        x = conv2d(64, 3, 2, 1, use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(batch_norm("bn1", self.axis_name, train, self.dtype)(x))
        x = conv2d(64, 3, 1, 1, use_bias=False, name="conv2", dtype=self.dtype)(x)
        x = nn.relu(batch_norm("bn2", self.axis_name, train, self.dtype)(x))
        x = conv2d(128, 3, 1, 1, use_bias=False, name="conv3", dtype=self.dtype)(x)
        x = nn.relu(batch_norm("bn3", self.axis_name, train, self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        if self.block == "group":
            stage_planes = (128, 256, 512, 1024)
            expansion = 2
        else:
            stage_planes = (64, 128, 256, 512)
            expansion = 4 if self.block == "bottleneck" else 1
        # (stride, dilate) per stage after surgery; dilate=1 means untouched
        strides = [1, 2, 2, 2]
        dilates = [1, 1, 1, 1]
        if self.dilate_scale == 8:
            strides[2:] = [1, 1]
            dilates[2:] = [2, 4]
        elif self.dilate_scale == 16:
            strides[3] = 1
            dilates[3] = 2

        inplanes = 128
        conv_out = []
        for si, (planes, blocks) in enumerate(zip(stage_planes, self.layers)):
            for b in range(blocks):
                s = strides[si] if b == 0 else 1
                d = dilates[si]
                # the conv that carried the removed stride gets dilate//2
                first_d = max(d // 2, 1) if (b == 0 and strides[si] == 1 and d > 1) else d
                needs_ds = b == 0 and (strides[si] != 1 or inplanes != planes * expansion)
                name = f"layer{si + 1}.{b}"
                if self.block == "basic":
                    x = _BasicBlock(planes, s, needs_ds, first_d, d,
                                    self.axis_name, self.dtype, name=name)(x, train)
                    inplanes = planes
                else:
                    x = _Bottleneck(planes, s, needs_ds, first_d, self.groups,
                                    self.axis_name, self.dtype, name=name)(x, train)
                    inplanes = planes * expansion
            conv_out.append(x)
        return conv_out if return_feature_maps else [x]


def resnet18(dilate_scale=0, axis_name=None, dtype=jnp.float32):
    return MITResNet("basic", (2, 2, 2, 2), 1, dilate_scale, axis_name, dtype)


def resnet50(dilate_scale=0, axis_name=None, dtype=jnp.float32):
    return MITResNet("bottleneck", (3, 4, 6, 3), 1, dilate_scale, axis_name, dtype)


def resnet101(dilate_scale=0, axis_name=None, dtype=jnp.float32):
    return MITResNet("bottleneck", (3, 4, 23, 3), 1, dilate_scale, axis_name, dtype)


def resnext101(dilate_scale=0, axis_name=None, dtype=jnp.float32):
    return MITResNet("group", (3, 4, 23, 3), 32, dilate_scale, axis_name, dtype)


# ---------------------------------------------------------------------------
# MobileNetV2 (mobilenet.py:22-143) + MobileNetV2Dilated (model_utils.py:118-186)

_MBV2_SETTING = [
    # t (expand), c (out), n (repeats), s (stride)
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
_MBV2_DOWN_IDX = (2, 4, 7, 14)  # model_utils.py:126


class _InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1  # >1 after _nostride_dilate surgery (3x3 dw conv only)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = round(self.inp * self.expand)
        out = x
        i = 0
        if self.expand != 1:
            out = conv2d(hidden, 1, 1, 0, use_bias=False, name=f"conv.{i}", dtype=self.dtype)(out)
            out = batch_norm(f"conv.{i + 1}", self.axis_name, train, self.dtype)(out)
            out = relu6(out)
            i += 3
        out = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride),
            padding=((self.dilation, self.dilation), (self.dilation, self.dilation)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=hidden, use_bias=False,
            dtype=self.dtype, name=f"conv.{i}",
        )(out)
        out = batch_norm(f"conv.{i + 1}", self.axis_name, train, self.dtype)(out)
        out = relu6(out)
        i += 3
        out = conv2d(self.oup, 1, 1, 0, use_bias=False, name=f"conv.{i}", dtype=self.dtype)(out)
        out = batch_norm(f"conv.{i + 1}", self.axis_name, train, self.dtype)(out)
        if self.stride == 1 and self.inp == self.oup:
            return x + out
        return out


class MobileNetV2Dilated(nn.Module):
    """MobileNetV2 trunk (classifier-free) with the wrapper's dilation
    surgery and feature-pyramid forward (model_utils.py:118-186).

    ``dilate_scale=0`` reproduces the plain trunk; 8/16 convert the late
    stride-2 depthwise convs to dilated stride-1 per _nostride_dilate.
    """

    dilate_scale: int = 8
    width_mult: float = 1.0
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_maps: bool = True):
        # features[0]: conv_bn stem (3 -> 32, stride 2)
        c0 = int(32 * self.width_mult)
        x = conv2d(c0, 3, 2, 1, use_bias=False, name="features.0.0", dtype=self.dtype)(x)
        x = batch_norm("features.0.1", self.axis_name, train, self.dtype)(x)
        x = relu6(x)

        # plan: expand the (t, c, n, s) table into per-feature (stride, dil)
        plan = []
        inp = c0
        for t, c, n, s in _MBV2_SETTING:
            oup = int(c * self.width_mult)
            for i in range(n):
                plan.append((inp, oup, s if i == 0 else 1, t))
                inp = oup
        total = len(plan) + 1  # + stem; the wrapper drops the final 1x1 conv
        down_second, down_last = _MBV2_DOWN_IDX[-2], _MBV2_DOWN_IDX[-1]

        conv_out = []
        for fi, (inp_c, oup_c, s, t) in enumerate(plan, start=1):
            dil = 1
            stride = s
            if self.dilate_scale == 8:
                if down_second <= fi < down_last:
                    dil, stride = (1 if s == 2 else 2), 1 if s == 2 else s
                elif fi >= down_last:
                    dil, stride = (2 if s == 2 else 4), 1 if s == 2 else s
            elif self.dilate_scale == 16 and fi >= down_last:
                dil, stride = (1 if s == 2 else 2), 1 if s == 2 else s
            x = _InvertedResidual(inp_c, oup_c, stride, t, dil, self.axis_name,
                                  self.dtype, name=f"features.{fi}")(x, train)
            if fi in _MBV2_DOWN_IDX:
                conv_out.append(x)
        conv_out.append(x)
        return conv_out if return_feature_maps else [x]


def build_backbone(arch: str, dilate_scale: int = 8, axis_name=None, dtype=jnp.float32):
    """Registry for the stock-backbone inventory (unreachable from the
    reference's own builder — see module docstring)."""
    archs = {
        "resnet18": resnet18,
        "resnet18dilated": lambda **kw: resnet18(dilate_scale or 8, **kw),
        "resnet50": resnet50,
        "resnet50dilated": lambda **kw: resnet50(dilate_scale or 8, **kw),
        "resnet101": resnet101,
        "resnet101dilated": lambda **kw: resnet101(dilate_scale or 8, **kw),
        "resnext101": resnext101,
        "mobilenetv2dilated": lambda **kw: MobileNetV2Dilated(dilate_scale or 8, 1.0, **kw),
    }
    if arch not in archs:
        raise ValueError(f"Unknown backbone: {arch}")
    fn = archs[arch]
    if arch.endswith("dilated"):
        return fn(axis_name=axis_name, dtype=dtype)
    return fn(0, axis_name, dtype)
