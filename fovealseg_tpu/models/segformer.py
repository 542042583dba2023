"""SegFormer (MiT-B5-ish) encoder, flax/NHWC — no transformers dependency.

Rebuild of ``CustomSegformer`` (/root/reference/models/segformer.py:9-105):
HF SegformerConfig with depths [3, 6, 40, 3], hidden [64, 128, 320, 512],
**strides [1, 2, 2, 2]** (stage-1 stride 1 keeps full resolution for the
80x80 task input), heads [1, 2, 5, 8], sr_ratios [8, 4, 2, 1], MixFFN ratio
4; output = channel-concat of all 4 stage feature maps bilinearly upsampled
to stage-1 resolution (64+128+320+512 = 1024 channels -> MODEL.fc_dim 1024,
README.md:85).

Attention over stage-1's full-resolution tokens uses spatial-reduction (sr)
k/v — the 6400-token attention maps onto the MXU as plain batched matmuls.
Module names mirror the HF state_dict (``segformer.encoder.*``) for
checkpoint import.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from fovealseg_tpu.core.interpolate import resize_bilinear
from fovealseg_tpu.models.layers import kaiming_normal

B5 = dict(
    depths=(3, 6, 40, 3),
    hidden_sizes=(64, 128, 320, 512),
    strides=(1, 2, 2, 2),
    patch_sizes=(7, 3, 3, 3),
    num_heads=(1, 2, 5, 8),
    sr_ratios=(8, 4, 2, 1),
    mlp_ratio=4,
)


def _dense(features, name, dtype):
    return nn.Dense(features, kernel_init=nn.initializers.xavier_uniform(), dtype=dtype, name=name)


def _ln(name, dtype):
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)


class EfficientSelfAttention(nn.Module):
    """HF SegformerEfficientSelfAttention + output projection."""

    hidden: int
    heads: int
    sr_ratio: int
    attn_drop: float = 0.2  # config.attention_probs_dropout_prob (segformer.py:98)
    proj_drop: float = 0.3  # config.hidden_dropout_prob (segformer.py:97)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        # x: [B, N, C] tokens; hw: (H, W) of the token grid
        b, n, c = x.shape
        h, w = hw
        head_dim = c // self.heads
        q = _dense(c, "self.query", self.dtype)(x)
        if self.sr_ratio > 1:
            kv_in = x.reshape(b, h, w, c)
            kv_in = nn.Conv(
                c, (self.sr_ratio, self.sr_ratio), strides=(self.sr_ratio, self.sr_ratio),
                kernel_init=kaiming_normal, dtype=self.dtype, name="self.sr",
            )(kv_in)
            kv_in = kv_in.reshape(b, -1, c)
            kv_in = _ln("self.layer_norm", self.dtype)(kv_in)
        else:
            kv_in = x
        k = _dense(c, "self.key", self.dtype)(kv_in)
        v = _dense(c, "self.value", self.dtype)(kv_in)

        def split(t):
            return t.reshape(b, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = _dense(c, "output.dense", self.dtype)(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class MixFFN(nn.Module):
    """dense -> 3x3 depthwise conv -> GELU -> dense (HF SegformerMixFFN)."""

    hidden: int
    ratio: int = 4
    drop: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        b, n, c = x.shape
        h, w = hw
        mid = c * self.ratio
        y = _dense(mid, "dense1", self.dtype)(x)
        y = y.reshape(b, h, w, mid)
        y = nn.Conv(
            mid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=mid,
            kernel_init=kaiming_normal, dtype=self.dtype, name="dwconv.dwconv",
        )(y)
        y = y.reshape(b, n, mid)
        y = nn.gelu(y)
        y = nn.Dropout(self.drop, deterministic=not train)(y)
        y = _dense(c, "dense2", self.dtype)(y)
        return nn.Dropout(self.drop, deterministic=not train)(y)


class SegformerLayer(nn.Module):
    hidden: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    drop_path: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        def dp(y):
            if self.drop_path == 0.0 or not train:
                return y
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (y.shape[0], 1, 1)
            ).astype(y.dtype)
            return y * mask / keep

        a = EfficientSelfAttention(
            self.hidden, self.heads, self.sr_ratio, dtype=self.dtype, name="attention"
        )(_ln("layer_norm_1", self.dtype)(x), hw, train)
        x = x + dp(a)
        m = MixFFN(self.hidden, self.mlp_ratio, dtype=self.dtype, name="mlp")(
            _ln("layer_norm_2", self.dtype)(x), hw, train
        )
        return x + dp(m)


class SegFormerEncoder(nn.Module):
    """MiT trunk returning [B, H1, W1, sum(hidden)] concat features."""

    cfg: dict = None
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg or B5
        depths = cfg["depths"]
        total = sum(depths)
        dp_rates = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        feats = []
        cur = 0
        prefix = "segformer.encoder"
        for s in range(4):
            ps, st, ch = cfg["patch_sizes"][s], cfg["strides"][s], cfg["hidden_sizes"][s]
            pad = ps // 2
            x = nn.Conv(
                ch, (ps, ps), strides=(st, st), padding=((pad, pad), (pad, pad)),
                kernel_init=kaiming_normal, dtype=self.dtype,
                name=f"{prefix}.patch_embeddings.{s}.proj",
            )(x)
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            tokens = _ln(f"{prefix}.patch_embeddings.{s}.layer_norm", self.dtype)(tokens)
            for j in range(depths[s]):
                tokens = SegformerLayer(
                    ch, cfg["num_heads"][s], cfg["sr_ratios"][s], cfg["mlp_ratio"],
                    dp_rates[cur], self.dtype, name=f"{prefix}.block.{s}.{j}",
                )(tokens, (h, w), train)
                cur += 1
            tokens = _ln(f"{prefix}.layer_norm.{s}", self.dtype)(tokens)
            x = tokens.reshape(b, h, w, c)
            feats.append(x)

        h1, w1 = feats[0].shape[1], feats[0].shape[2]
        ups = [feats[0]] + [
            resize_bilinear(f.astype(jnp.float32), (h1, w1)).astype(self.dtype)
            for f in feats[1:]
        ]
        return [jnp.concatenate(ups, axis=-1)]
