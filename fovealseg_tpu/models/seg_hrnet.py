"""Stock semantic-segmentation HRNet ("seg_hrnet"), flax/NHWC.

Rebuild of /root/reference/models/seg_hrnet.py:1-482 (the Microsoft HRNet
semantic-seg model). In the reference this file is part of the stock model
inventory (imported alongside resnet/resnext/mobilenet, SURVEY.md §2.2) but
is NOT actually importable there: it requires
``.sync_bn.inplace_abn.bn.InPlaceABNSync`` (seg_hrnet.py:22), a package the
reference does not ship. It is rebuilt here to complete the inventory, with
``InPlaceABNSync(activation='none')`` treated as plain BatchNorm — exactly
its forward semantics (the reference wraps it with ``activation='none'`` at
seg_hrnet.py:24, so no in-place activation is ever applied).

Differences from ``models/hrnet.py`` (HRNetV2-nodownsp, the flagship
encoder):

* stride-2 x stride-2 stem (seg_hrnet.py:266-272) — H/4 base resolution,
* config-driven stages (``extra['STAGE{2,3,4}']`` dicts with NUM_MODULES /
  NUM_BRANCHES / NUM_BLOCKS per branch / NUM_CHANNELS / BLOCK, matching the
  upstream HRNet config grammar, seg_hrnet.py:276-304) supporting both
  BASIC and BOTTLENECK branch blocks,
* no dropout in BasicBlock,
* a ``last_layer`` head: 1x1 conv -> BN -> ReLU -> k x k conv to
  ``num_classes`` (seg_hrnet.py:309-325; padding 1 iff FINAL_CONV_KERNEL=3).

BN momentum is 0.01 upstream (seg_hrnet.py:25) — a running-stat update rate,
irrelevant to forward parity; our ``batch_norm`` default is kept.

Submodule names follow the torch ``state_dict`` so the standard checkpoint
import shim (``train/checkpoint.py::import_torch_state_dict``) works
unchanged; numerical forward parity vs the exec'd reference file is pinned
in ``tests/test_seg_hrnet.py``.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_bilinear
from fovealseg_tpu.models.hrnet import BasicBlock, Bottleneck
from fovealseg_tpu.models.layers import batch_norm, conv2d

# Published HRNet-W48 semantic-seg configuration (the standard instantiation
# of the upstream config grammar; the reference ships no yaml for this file).
W48_EXTRA: Mapping[str, Any] = dict(
    STAGE2=dict(NUM_MODULES=1, NUM_BRANCHES=2, NUM_BLOCKS=(4, 4),
                NUM_CHANNELS=(48, 96), BLOCK="BASIC", FUSE_METHOD="SUM"),
    STAGE3=dict(NUM_MODULES=4, NUM_BRANCHES=3, NUM_BLOCKS=(4, 4, 4),
                NUM_CHANNELS=(48, 96, 192), BLOCK="BASIC", FUSE_METHOD="SUM"),
    STAGE4=dict(NUM_MODULES=3, NUM_BRANCHES=4, NUM_BLOCKS=(4, 4, 4, 4),
                NUM_CHANNELS=(48, 96, 192, 384), BLOCK="BASIC", FUSE_METHOD="SUM"),
    FINAL_CONV_KERNEL=1,
)

_EXPANSION = {"BASIC": 1, "BOTTLENECK": 4}


def _branch_block(block: str, out_channels: int, name: str, axis_name, dtype):
    """One branch block producing ``out_channels`` (post-expansion)."""
    if block == "BASIC":
        # seg_hrnet BasicBlock has no dropout (seg_hrnet.py:34-63)
        return BasicBlock(out_channels, 1, False, axis_name, dtype,
                          drop_rate=0.0, name=name)
    if block == "BOTTLENECK":
        return Bottleneck(out_channels // 4, 1, False, axis_name, dtype, name=name)
    raise ValueError(f"Unknown HRNet block type: {block}")


class GeneralHRModule(nn.Module):
    """One config-driven HRNet exchange unit (seg_hrnet.py:76-252).

    ``channels`` are the post-expansion per-branch widths (the reference's
    ``num_inchannels`` — transitions always feed expanded channels, so branch
    blocks never carry a downsample). ``multi_scale_output=False`` fuses only
    into the finest branch (used by upstream ``_make_stage`` on the last
    module when requested; seg_hrnet.py:383-390).
    """

    channels: Sequence[int]
    num_blocks: Sequence[int]
    block: str = "BASIC"
    multi_scale_output: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        feats = []
        for i in range(n):
            x = xs[i]
            for b in range(self.num_blocks[i]):
                x = _branch_block(self.block, self.channels[i],
                                  f"branches.{i}.{b}", self.axis_name, self.dtype)(x, train)
            feats.append(x)
        if n == 1:
            return feats

        n_out = n if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(n):
                if j == i:
                    t = feats[j]
                elif j > i:
                    # coarse -> fine: 1x1 conv + BN + bilinear up (seg_hrnet.py:160-171)
                    t = conv2d(self.channels[i], 1, 1, 0, use_bias=False,
                               name=f"fuse_layers.{i}.{j}.0", dtype=self.dtype)(feats[j])
                    t = batch_norm(f"fuse_layers.{i}.{j}.1", self.axis_name, train, self.dtype)(t)
                    t = resize_bilinear(t, (feats[i].shape[1], feats[i].shape[2]))
                else:
                    # fine -> coarse: chain of stride-2 3x3 convs (seg_hrnet.py:172-192)
                    t = feats[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        t = conv2d(out_ch, 3, 2, 1, use_bias=False,
                                   name=f"fuse_layers.{i}.{j}.{k}.0", dtype=self.dtype)(t)
                        t = batch_norm(f"fuse_layers.{i}.{j}.{k}.1", self.axis_name,
                                       train, self.dtype)(t)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class SegHRNet(nn.Module):
    """``HighResolutionNet`` (seg_hrnet.py:260-447): stem -> layer1 ->
    config-driven stages 2-4 -> concat head -> ``last_layer`` class logits
    at 1/4 input resolution."""

    num_classes: int
    extra: Mapping[str, Any] = None  # defaults to W48_EXTRA
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def _extra(self) -> Mapping[str, Any]:
        return self.extra if self.extra is not None else W48_EXTRA

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = self._extra()

        # stem: two stride-2 3x3 convs (seg_hrnet.py:266-272)
        x = conv2d(64, 3, 2, 1, use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = batch_norm("bn1", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)
        x = conv2d(64, 3, 2, 1, use_bias=False, name="conv2", dtype=self.dtype)(x)
        x = batch_norm("bn2", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)

        # layer1: 4 Bottlenecks 64 -> 256 (seg_hrnet.py:274)
        for b in range(4):
            x = Bottleneck(64, 1, b == 0, self.axis_name, self.dtype,
                           name=f"layer1.{b}")(x, train)

        pre = [256]
        feats = [x]
        for sidx, key in ((1, "STAGE2"), (2, "STAGE3"), (3, "STAGE4")):
            scfg = extra[key]
            block = scfg.get("BLOCK", "BASIC")
            cur = [c * _EXPANSION[block] for c in scfg["NUM_CHANNELS"]]

            # transition{sidx} (seg_hrnet.py:327-365)
            new = []
            for i in range(scfg["NUM_BRANCHES"]):
                if i < len(pre):
                    if cur[i] != pre[i]:
                        t = conv2d(cur[i], 3, 1, 1, use_bias=False,
                                   name=f"transition{sidx}.{i}.0", dtype=self.dtype)(feats[i])
                        t = batch_norm(f"transition{sidx}.{i}.1", self.axis_name,
                                       train, self.dtype)(t)
                        t = nn.relu(t)
                    else:
                        t = feats[i]
                else:
                    t = feats[-1]
                    for j in range(i + 1 - len(pre)):
                        out_ch = cur[i] if j == i - len(pre) else pre[-1]
                        t = conv2d(out_ch, 3, 2, 1, use_bias=False,
                                   name=f"transition{sidx}.{i}.{j}.0", dtype=self.dtype)(t)
                        t = batch_norm(f"transition{sidx}.{i}.{j}.1", self.axis_name,
                                       train, self.dtype)(t)
                        t = nn.relu(t)
                new.append(t)
            feats = new

            for m in range(scfg["NUM_MODULES"]):
                feats = GeneralHRModule(
                    cur, scfg["NUM_BLOCKS"], block, True, self.axis_name,
                    self.dtype, name=f"stage{sidx + 1}.{m}",
                )(feats, train)
            pre = cur

        # head: upsample all branches to the top resolution, concat,
        # last_layer 1x1 conv -> BN -> ReLU -> final conv (seg_hrnet.py:309-325, 436-445)
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]] + [resize_bilinear(f, (h, w)) for f in feats[1:]], axis=-1)
        c_all = sum(pre)
        x = conv2d(c_all, 1, 1, 0, use_bias=True, name="last_layer.0", dtype=self.dtype)(cat)
        x = batch_norm("last_layer.1", self.axis_name, train, self.dtype)(x)
        x = nn.relu(x)
        k = int(extra.get("FINAL_CONV_KERNEL", 1))
        return conv2d(self.num_classes, k, 1, 1 if k == 3 else 0, use_bias=True,
                      name="last_layer.3", dtype=self.dtype)(x)


def get_seg_model(num_classes: int, extra: Mapping[str, Any] = None,
                  axis_name=None, dtype=jnp.float32) -> SegHRNet:
    """Factory mirroring seg_hrnet.py:475-479 (config -> model)."""
    return SegHRNet(num_classes=num_classes, extra=extra, axis_name=axis_name,
                    dtype=dtype)
