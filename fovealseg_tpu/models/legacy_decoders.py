"""Legacy MIT-scene-parsing decoders: C1DeepSup, PPM, PPMDeepsup, UPerNet.

Rebuild of /root/reference/models/model_utils.py:189-221 (C1DeepSup) and
312-507 (PPM/PPMDeepsup/UPerNet). In the reference these classes exist but
are NOT reachable from ``ModelBuilder.build_decoder`` (models/models.py:
1160-1170 raises for every arch except ``c1``); the builder here raises
identically (``models/builder.py``), and these live in their own registry
(``build_legacy_decoder``) for inventory parity and reuse.

Semantics preserved: NHWC, torch-compatible parameter naming for the
checkpoint import shim, ``use_softmax`` inference branch (bilinear resize to
``seg_hw`` + softmax) vs the log-softmax training return (tuple with the
deep-supervision head for *DeepSup variants); adaptive average pooling is
``core.interpolate.resize_area``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_area, resize_bilinear
from fovealseg_tpu.models.layers import batch_norm, conv2d


def _log_softmax(x):
    return nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _softmax_resized(x, seg_hw):
    if seg_hw is not None:
        x = resize_bilinear(x, seg_hw)
    return nn.softmax(x.astype(jnp.float32), axis=-1)


class _CBR(nn.Module):
    """conv3x3_bn_relu (model_utils.py:9-15): Sequential(conv, BN, ReLU) —
    child names .0 (conv) / .1 (bn) match the torch state_dict."""

    planes: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.planes, 3, 1, 1, use_bias=False, name="0", dtype=self.dtype)(x)
        x = batch_norm("1", self.axis_name, train, self.dtype)(x)
        return nn.relu(x)


class C1DeepSup(nn.Module):
    """model_utils.py:189-221."""

    num_class: int = 150
    fc_dim: int = 2048
    use_softmax: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_hw=None, train: bool = False):
        conv5 = conv_out[-1]
        x = _CBR(self.fc_dim // 4, self.axis_name, self.dtype, name="cbr")(conv5, train)
        x = conv2d(self.num_class, 1, 1, 0, name="conv_last", dtype=self.dtype)(x)
        if self.use_softmax:
            return _softmax_resized(x, seg_hw)
        conv4 = conv_out[-2]
        d = _CBR(self.fc_dim // 4, self.axis_name, self.dtype, name="cbr_deepsup")(conv4, train)
        d = conv2d(self.num_class, 1, 1, 0, name="conv_last_deepsup", dtype=self.dtype)(d)
        return _log_softmax(x), _log_softmax(d)


class _PPMPool(nn.Module):
    """One pyramid branch: adaptive pool -> 1x1 conv -> BN -> ReLU, resized
    back to the input resolution. Child names .1/.2 (conv/bn after the
    parameterless AdaptiveAvgPool at .0) match the torch Sequential."""

    scale: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw, train: bool = False):
        p = resize_area(x, (self.scale, self.scale))
        p = conv2d(512, 1, 1, 0, use_bias=False, name="1", dtype=self.dtype)(p)
        p = batch_norm("2", self.axis_name, train, self.dtype)(p)
        return resize_bilinear(nn.relu(p), out_hw)


def _ppm_head(self, ppm_cat, train):
    """conv3x3-BN-ReLU-Dropout(0.1)-1x1 classifier head shared by PPM and
    PPMDeepsup (model_utils.py:339-346 == 382-389; one definition keeps the
    'conv_last.*' checkpoint-import names in sync)."""
    x = conv2d(512, 3, 1, 1, use_bias=False, name="conv_last.0", dtype=self.dtype)(ppm_cat)
    x = batch_norm("conv_last.1", self.axis_name, train, self.dtype)(x)
    x = nn.relu(x)
    x = nn.Dropout(0.1, deterministic=not train, name="conv_last.3")(x)
    return conv2d(self.num_class, 1, 1, 0, name="conv_last.4", dtype=self.dtype)(x)


class PPM(nn.Module):
    """model_utils.py:312-358."""

    num_class: int = 150
    fc_dim: int = 4096
    use_softmax: bool = False
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    _head = _ppm_head

    @nn.compact
    def __call__(self, conv_out, seg_hw=None, train: bool = False):
        conv5 = conv_out[-1]
        hw = (conv5.shape[1], conv5.shape[2])
        outs = [conv5]
        for i, s in enumerate(self.pool_scales):
            outs.append(_PPMPool(s, self.axis_name, self.dtype, name=f"ppm.{i}")(conv5, hw, train))
        x = self._head(jnp.concatenate(outs, -1), train)
        if self.use_softmax:
            return _softmax_resized(x, seg_hw)
        return _log_softmax(x)


class PPMDeepsup(nn.Module):
    """model_utils.py:361-419."""

    num_class: int = 150
    fc_dim: int = 4096
    use_softmax: bool = False
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    _head = _ppm_head

    @nn.compact
    def __call__(self, conv_out, seg_hw=None, train: bool = False):
        conv5 = conv_out[-1]
        hw = (conv5.shape[1], conv5.shape[2])
        outs = [conv5]
        for i, s in enumerate(self.pool_scales):
            outs.append(_PPMPool(s, self.axis_name, self.dtype, name=f"ppm.{i}")(conv5, hw, train))
        x = self._head(jnp.concatenate(outs, -1), train)
        if self.use_softmax:
            return _softmax_resized(x, seg_hw)
        conv4 = conv_out[-2]
        d = _CBR(self.fc_dim // 4, self.axis_name, self.dtype, name="cbr_deepsup")(conv4, train)
        d = nn.Dropout(0.1, deterministic=not train, name="dropout_deepsup")(d)
        d = conv2d(self.num_class, 1, 1, 0, name="conv_last_deepsup", dtype=self.dtype)(d)
        return _log_softmax(x), _log_softmax(d)


class UPerNet(nn.Module):
    """model_utils.py:422-507 (PPM + FPN fusion)."""

    num_class: int = 150
    fc_dim: int = 4096
    use_softmax: bool = False
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fpn_inplanes: Sequence[int] = (256, 512, 1024, 2048)
    fpn_dim: int = 256
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv_out, seg_hw=None, train: bool = False):
        conv5 = conv_out[-1]
        hw = (conv5.shape[1], conv5.shape[2])
        # PPM over the top level; NOTE the reference applies the conv AFTER
        # the bilinear resize here (ppm_conv(interpolate(pool(...)))) —
        # opposite order to PPM/PPMDeepsup
        outs = [conv5]
        for i, s in enumerate(self.pool_scales):
            p = resize_bilinear(resize_area(conv5, (s, s)), hw)
            p = conv2d(512, 1, 1, 0, use_bias=False, name=f"ppm_conv.{i}.0", dtype=self.dtype)(p)
            p = batch_norm(f"ppm_conv.{i}.1", self.axis_name, train, self.dtype)(p)
            outs.append(nn.relu(p))
        f = _CBR(self.fpn_dim, self.axis_name, self.dtype, name="ppm_last_conv")(
            jnp.concatenate(outs, -1), train
        )

        fpn_features = [f]
        for i in reversed(range(len(conv_out) - 1)):
            lat = conv2d(self.fpn_dim, 1, 1, 0, use_bias=False,
                         name=f"fpn_in.{i}.0", dtype=self.dtype)(conv_out[i])
            lat = batch_norm(f"fpn_in.{i}.1", self.axis_name, train, self.dtype)(lat)
            lat = nn.relu(lat)
            f = resize_bilinear(f, (lat.shape[1], lat.shape[2]))
            f = lat + f
            fpn_features.append(
                _CBR(self.fpn_dim, self.axis_name, self.dtype, name=f"fpn_out.{i}.0")(f, train)
            )
        fpn_features.reverse()  # [P2 .. P5]
        out_hw = (fpn_features[0].shape[1], fpn_features[0].shape[2])
        fusion = [fpn_features[0]] + [resize_bilinear(t, out_hw) for t in fpn_features[1:]]
        x = _CBR(self.fpn_dim, self.axis_name, self.dtype, name="conv_last.0")(
            jnp.concatenate(fusion, -1), train
        )
        x = conv2d(self.num_class, 1, 1, 0, name="conv_last.1", dtype=self.dtype)(x)
        if self.use_softmax:
            return _softmax_resized(x, seg_hw)
        return _log_softmax(x)


def build_legacy_decoder(arch: str, num_class: int = 150, fc_dim: int = 2048,
                         use_softmax: bool = False, axis_name=None,
                         dtype=jnp.float32):
    """Registry for the decoder inventory that the reference defines but its
    own builder cannot reach (models/models.py:1160-1170 raises)."""
    archs = {
        "c1_deepsup": C1DeepSup,
        "ppm": PPM,
        "ppm_deepsup": PPMDeepsup,
        "upernet": UPerNet,
    }
    if arch not in archs:
        raise ValueError(f"Unknown legacy decoder: {arch}")
    return archs[arch](num_class=num_class, fc_dim=fc_dim, use_softmax=use_softmax,
                       axis_name=axis_name, dtype=dtype)
