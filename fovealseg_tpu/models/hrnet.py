"""HRNetV2-W64-ish "nodownsp" encoder (stride-1 stem), flax/NHWC.

Rebuild of /root/reference/models/hrnetv2_nodownsp.py:1-454:

* stem: two stride-1 3x3 convs (the "nodownsp" modification — reference
  lines 279-284 keep full resolution), then 4 Bottlenecks 64->256.
* stages 2/3/4 with 2/3/4 branches, channels (64, 128, 256, 512),
  1/4/3 modules of 4 BasicBlocks per branch; standard HRNet cross-resolution
  fuse (1x1 conv + bilinear up for coarse->fine, stride-2 3x3 chains for
  fine->coarse).
* BasicBlock carries Dropout(0.3) after each conv (reference lines 44-56).
* head: upsample all branches to the top resolution and concatenate
  (64+128+256+512 = 960 = MODEL.fc_dim), reference lines 425-441.

Module names follow the torch state_dict for checkpoint import.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_bilinear
from fovealseg_tpu.models.layers import batch_norm, conv2d

STAGE2 = dict(num_modules=1, num_branches=2, num_blocks=4, channels=(64, 128))
STAGE3 = dict(num_modules=4, num_branches=3, num_blocks=4, channels=(64, 128, 256))
STAGE4 = dict(num_modules=3, num_branches=4, num_blocks=4, channels=(64, 128, 256, 512))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    drop_rate: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = nn.Dropout(self.drop_rate, deterministic=not train, name="dropout")(out)
        out = batch_norm("bn1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = nn.Dropout(self.drop_rate, deterministic=not train, name="dropout2")(out)
        out = batch_norm("bn2", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, self.stride, 0, use_bias=False, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 1, 1, 0, use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = batch_norm("bn1", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, self.stride, 1, use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = batch_norm("bn2", self.axis_name, train, self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes * self.expansion, 1, 1, 0, use_bias=False, name="conv3", dtype=self.dtype)(out)
        out = batch_norm("bn3", self.axis_name, train, self.dtype)(out)
        if self.has_downsample:
            residual = conv2d(self.planes * self.expansion, 1, self.stride, 0, use_bias=False, name="downsample.0", dtype=self.dtype)(x)
            residual = batch_norm("downsample.1", self.axis_name, train, self.dtype)(residual)
        return nn.relu(out + residual)


class HighResolutionModule(nn.Module):
    """One HRNet exchange unit: per-branch BasicBlocks + all-to-all fuse."""

    channels: Sequence[int]
    num_blocks: int = 4
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        feats = []
        for i in range(n):
            x = xs[i]
            for b in range(self.num_blocks):
                x = BasicBlock(
                    self.channels[i], 1, False, self.axis_name, self.dtype,
                    name=f"branches.{i}.{b}",
                )(x, train)
            feats.append(x)

        fused = []
        for i in range(n):
            y = None
            for j in range(n):
                if j == i:
                    t = feats[j]
                elif j > i:
                    # coarse -> fine: 1x1 conv + BN, bilinear upsample
                    t = conv2d(self.channels[i], 1, 1, 0, use_bias=False,
                               name=f"fuse_layers.{i}.{j}.0", dtype=self.dtype)(feats[j])
                    t = batch_norm(f"fuse_layers.{i}.{j}.1", self.axis_name, train, self.dtype)(t)
                    t = resize_bilinear(t, (feats[i].shape[1], feats[i].shape[2]))
                else:
                    # fine -> coarse: chain of stride-2 3x3 convs
                    t = feats[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        t = conv2d(out_ch, 3, 2, 1, use_bias=False,
                                   name=f"fuse_layers.{i}.{j}.{k}.0", dtype=self.dtype)(t)
                        t = batch_norm(f"fuse_layers.{i}.{j}.{k}.1", self.axis_name, train, self.dtype)(t)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class HRNetV2NoDownsp(nn.Module):
    """Full encoder; returns [features] with 960 channels at input resolution.

    ``stage_modules``/``num_blocks`` default to the reference architecture
    ((1, 4, 3) modules, 4 blocks); reduced values give a structurally
    identical tiny variant for fast tests.
    """

    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    stage_modules: tuple = (1, 4, 3)
    num_blocks: int = 4
    layer1_blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem (stride 1 — "nodownsp")
        x = conv2d(64, 3, 1, 1, use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = batch_norm("bn1", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)
        x = conv2d(64, 3, 1, 1, use_bias=False, name="conv2", dtype=self.dtype)(x)
        x = batch_norm("bn2", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)

        # layer1: 4 Bottlenecks 64 -> 256
        for b in range(self.layer1_blocks):
            x = Bottleneck(64, 1, b == 0, self.axis_name, self.dtype, name=f"layer1.{b}")(x, train)

        # transition1: [256] -> [64, 128(s2)]
        x0 = conv2d(64, 3, 1, 1, use_bias=False, name="transition1.0.0", dtype=self.dtype)(x)
        x0 = batch_norm("transition1.0.1", self.axis_name, train, self.dtype)(x0)
        x0 = nn.relu(x0)
        x1 = conv2d(128, 3, 2, 1, use_bias=False, name="transition1.1.0.0", dtype=self.dtype)(x)
        x1 = batch_norm("transition1.1.0.1", self.axis_name, train, self.dtype)(x1)
        x1 = nn.relu(x1)
        feats = [x0, x1]

        for m in range(self.stage_modules[0]):
            feats = HighResolutionModule(STAGE2["channels"], self.num_blocks, self.axis_name,
                                         self.dtype, name=f"stage2.{m}")(feats, train)

        # transition2: new branch from last output (128 -> 256, s2)
        t2 = conv2d(256, 3, 2, 1, use_bias=False, name="transition2.2.0.0", dtype=self.dtype)(feats[-1])
        t2 = batch_norm("transition2.2.0.1", self.axis_name, train, self.dtype)(t2)
        feats = feats + [nn.relu(t2)]

        for m in range(self.stage_modules[1]):
            feats = HighResolutionModule(STAGE3["channels"], self.num_blocks, self.axis_name,
                                         self.dtype, name=f"stage3.{m}")(feats, train)

        # transition3: new branch (256 -> 512, s2)
        t3 = conv2d(512, 3, 2, 1, use_bias=False, name="transition3.3.0.0", dtype=self.dtype)(feats[-1])
        t3 = batch_norm("transition3.3.0.1", self.axis_name, train, self.dtype)(t3)
        feats = feats + [nn.relu(t3)]

        for m in range(self.stage_modules[2]):
            feats = HighResolutionModule(STAGE4["channels"], self.num_blocks, self.axis_name,
                                         self.dtype, name=f"stage4.{m}")(feats, train)

        # head: upsample to top resolution, concat -> 960 channels
        h, w = feats[0].shape[1], feats[0].shape[2]
        ups = [feats[0]] + [resize_bilinear(f, (h, w)) for f in feats[1:]]
        return [jnp.concatenate(ups, axis=-1)]
