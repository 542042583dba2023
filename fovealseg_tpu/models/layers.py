"""Shared flax building blocks (NHWC, torch-compatible naming & semantics).

Conventions used across the model zoo:

* Layout is NHWC (TPU-native). Convs use explicit torch-style padding — never
  'SAME', whose asymmetric stride-2 padding differs from PyTorch.
* Modules/params are named after the reference's ``state_dict`` keys
  (``conv1``, ``bn1``, ``layer1.0`` …) so the PyTorch checkpoint import shim
  (fovealseg_tpu.train.torch_import) is a mechanical key/axis transpose.
* BatchNorm matches ``SynchronizedBatchNorm2d`` semantics
  (/root/reference/lib/nn/modules/batchnorm.py:38-140): torch momentum 0.1
  (flax momentum 0.9), eps 1e-5. Cross-replica statistics are a first-class
  option via ``axis_name`` — the TPU equivalent of SyncBN's
  ReduceAddCoalesced/Broadcast pipeline (a ``pmean`` inside the jitted step;
  SURVEY.md §2.5).
* Init mirrors ``ModelBuilder.weights_init`` (models/models.py:1149-1156):
  Kaiming-normal conv kernels, BN scale 1 / bias 1e-4.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
bn_bias_init = nn.initializers.constant(1e-4)

# ---------------------------------------------------------------------------
# Output-pixel-packed convolution (TPU lane-geometry optimization)
#
# The MXU is 128 output lanes wide, so a 64-output-channel conv can never
# exceed ~50 % utilization — and the flagship HRNet-nodownsp spends ~60 % of
# its FLOPs in 64-channel 3x3 convs at 80x80 (branch 0 + stem + bottleneck
# conv2; reference hrnetv2_nodownsp.py:279-443). Packing FOUR horizontally
# adjacent output pixels into the channel dimension turns each such conv
# into a (3, 6)-kernel stride-(1, 4) conv with 256 output channels, trading
# a 2x FLOP overhead (18 vs 9 kernel positions per output) for full lane
# occupancy.
#
# MEASURED NEGATIVE RESULT — OFF by default. In isolation the packed conv
# wins big (b8 80x80 bf16: 51.3 us -> 20.2 us, 2.5x; f32 1.5x) because a
# lone materialized conv really is lane-limited. Inside the full flagship
# encoder the same transform *loses*: 9.47 -> 10.42 ms/b8 (pack=4) and
# 9.98 ms (pack=2), full forward 13.54 -> 14.55 ms. In context XLA fuses
# BN/ReLU into the conv and pipelines spatial tiles, so the lane-occupancy
# ceiling is not the binding constraint the microbenchmark suggests — the
# 2x FLOPs plus the pad/reshape seams just cost. The mechanism is kept as
# an opt-in (`TPU.conv_pack` / `conv_packing()`) with exactness + autodiff
# tests, so the experiment is reproducible on other TPU generations where
# the tradeoff may flip.
#
# The transform is exact in f32 (the extra kernel positions multiply zeros)
# and a bf16 reassociation-level change otherwise. The flag is read at
# *trace* time — flip it before building a jitted function, never between
# calls to one.
# ---------------------------------------------------------------------------

_CONV_PACK_ENABLED = False

# ---------------------------------------------------------------------------
# W8A8 dynamic int8 quantization (TPU serving mode)
#
# The v5e MXU runs int8xint8->int32 at ~2x bf16 throughput. Measured on this
# chip (stacked 3x3 convs, differential timing, benchmarks/quant_probe):
#   64ch@80^2   0.89x  (N=64 is lane-limited either way; requant seams lose)
#   128ch@40^2  1.73x   256ch@20^2 2.07x   512ch@10^2 1.73x
# so quantization is applied ONLY to convs with cin>=QUANT_MIN_CH and
# cout>=QUANT_MIN_CH; the 64-channel HRNet branch stays bf16 (mixed W8A8).
#
# End-to-end (b8, benchmarks/variants.py --int8): flagship warped forward
# 13.41 -> 12.7-12.9 ms (+4-6%), serving +2%, segformer +3%, deeplab **-13%**
# (its OS8 trunk runs wide convs at 10x10 spatial — M=800 rows, MXU
# M-starved — where the serialized per-conv activation-max reduce outweighs
# the int8 MXU win). A largely-negative result end-to-end; kept as an
# opt-in experiment like TPU.conv_pack. Pre-quantizing weights via
# quantize_params measured identical inside a chained loop (XLA hoists the
# loop-invariant weight max/round itself); the hoist still matters for the
# serving CLI where each batch is a fresh top-level call. Opt-in via
# TPU.quantize="int8" — OFF by default (also: task-accuracy impact on real
# datasets can't be validated in this environment; argmax agreement >95%
# on synthetic inputs is pinned by tests/test_quantize.py).
#
# Scheme: symmetric, zero-point 0 (explicit zero padding stays exact).
#   weights     per-output-channel scale  s_w[c] = max|W[..,c]| / 127
#   activations per-tensor dynamic scale  s_x    = max|x| / 127  (per call —
#               no calibration set needed; the max-reduce is VPU-trivial)
#   y = (int8(x/s_x) (*) int8(W/s_w))_int32 * (s_x * s_w)  + bias
# Inference-only (the flag lives outside params; training never sees it).
# ---------------------------------------------------------------------------

_QUANT_INT8_ENABLED = False
QUANT_MIN_CH = 128


def set_quantization(on: bool) -> None:
    """Globally enable/disable int8 serving quantization (trace-time flag)."""
    global _QUANT_INT8_ENABLED
    _QUANT_INT8_ENABLED = bool(on)


def quantization_enabled() -> bool:
    return _QUANT_INT8_ENABLED


@contextlib.contextmanager
def quantization(on: bool = True):
    """Context manager: enable int8 quantization while tracing a program."""
    global _QUANT_INT8_ENABLED
    prev = _QUANT_INT8_ENABLED
    _QUANT_INT8_ENABLED = bool(on)
    try:
        yield
    finally:
        _QUANT_INT8_ENABLED = prev


def _quantizable(cin: int, cout: int) -> bool:
    return _QUANT_INT8_ENABLED and cin >= QUANT_MIN_CH and cout >= QUANT_MIN_CH


# publish mode (quantized_kernel_paths): quantizable TorchConvs register
# their quant variables during an abstract forward so callers can learn
# exactly which kernels the int8 path reads (plain nn.Conv layers — dilated
# trunks, segformer patch embeds — never read quant entries)
_QUANT_PUBLISH = False


@contextlib.contextmanager
def _quant_publish():
    global _QUANT_PUBLISH
    prev = _QUANT_PUBLISH
    _QUANT_PUBLISH = True
    try:
        yield
    finally:
        _QUANT_PUBLISH = prev


def quantized_kernel_paths(module, variables, *args, method=None, **kwargs):
    """Scope paths (tuples) of the quant entries ``module`` actually reads.

    Runs ONE abstract forward (jax.eval_shape — no compute, no device use)
    with the publish flag on; every quantizable TorchConv registers its
    ``kernel_q``/``w_scale`` variables, so the returned set covers exactly
    the convs the W8A8 path will consume."""
    import flax

    def run(vs):
        with quantization(), _quant_publish():
            _, mut = module.apply(vs, *args, mutable=["quant"], method=method, **kwargs)
        return mut

    shapes = jax.eval_shape(run, variables)
    flat = flax.traverse_util.flatten_dict(shapes.get("quant", {}))
    return {p[:-1] for p in flat}


def quantize_kernel(kernel):
    """(int8 kernel, f32 per-output-channel scale) for a [kh,kw,cin,cout]
    conv weight — symmetric, zero-point 0."""
    kf = jnp.asarray(kernel, jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    return jnp.round(kf / s_w).astype(jnp.int8), s_w


def quantize_params(params, paths=None):
    """Pre-quantize quantizable TorchConv kernels in a params pytree.

    Returns the 'quant' variable collection ({... 'kernel_q', 'w_scale'} at
    each conv's scope) to pass alongside params in ``module.apply`` — this
    hoists the per-step in-graph weight max/round (a full read of ~all conv
    weights per forward) out of the serving loop.

    ``paths`` (from :func:`quantized_kernel_paths`) restricts the collection
    to the scopes the module's int8 path actually reads; without it the
    shape filter alone would also quantize plain ``nn.Conv`` kernels
    (deeplab's dilated trunk, segformer's patch embeds) whose entries are
    never consumed — dead device memory in the serving process."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        if (
            path[-1] == "kernel"
            and getattr(v, "ndim", 0) == 4
            and v.shape[2] >= QUANT_MIN_CH
            and v.shape[3] >= QUANT_MIN_CH
            and (paths is None or path[:-1] in paths)
        ):
            kq, sw = quantize_kernel(v)
            out[path[:-1] + ("kernel_q",)] = kq
            out[path[:-1] + ("w_scale",)] = sw
    return flax.traverse_util.unflatten_dict(out)


def _int8_conv(x, kernel, stride: int, padding: int, w_q=None, s_w=None):
    """Mixed-precision W8A8 conv: dynamic per-tensor activation scale,
    per-output-channel weight scale, int32 accumulation on the MXU.
    Pass pre-quantized (w_q, s_w) to skip the in-graph weight quantize."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if w_q is None:
        w_q, s_w = quantize_kernel(kernel)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    x_q = jnp.round(xf / s_x).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    return (z.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)


def set_conv_packing(on: bool) -> None:
    """Globally enable/disable output-pixel conv packing (trace-time flag)."""
    global _CONV_PACK_ENABLED
    _CONV_PACK_ENABLED = bool(on)


def conv_packing_enabled() -> bool:
    return _CONV_PACK_ENABLED


@contextlib.contextmanager
def conv_packing(on: bool = True):
    """Context manager: enable packing while tracing a program."""
    global _CONV_PACK_ENABLED
    prev = _CONV_PACK_ENABLED
    _CONV_PACK_ENABLED = bool(on)
    try:
        yield
    finally:
        _CONV_PACK_ENABLED = prev


def _pack_factor(x_shape, kernel_size: int, stride: int, padding: int,
                 features: int) -> int:
    """4 when the packed formulation is profitable and shape-legal, else 1."""
    if not _CONV_PACK_ENABLED:
        return 1
    w = x_shape[2]
    if (
        kernel_size == 3
        and stride == 1
        and 2 * padding == kernel_size - 1  # same-size conv
        and features <= 64
        and w % 4 == 0
        and w >= 8
    ):
        return 4
    return 1


def _packed_conv(x, kernel, pack: int, padding: int):
    """Width-packed conv: pack adjacent output pixels into channels.

    kernel is the ordinary (kh, kw, cin, cout) weight; builds the
    (kh, kw+pack-1, cin, pack*cout) block-shifted weight in-graph (cheap,
    and autodiff routes gradients back to the shared positions)."""
    b, h, w, _ = x.shape
    kh, kw, cin, cout = kernel.shape
    wq = jnp.zeros((kh, kw + pack - 1, cin, pack * cout), kernel.dtype)
    for j in range(pack):
        wq = wq.at[:, j:j + kw, :, j * cout:(j + 1) * cout].set(kernel)
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding + pack - 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(xp.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xp, wq, (1, pack), "VALID", dimension_numbers=dn)
    return y.reshape(b, h, w // pack, pack, cout).reshape(b, h, w, cout)


class TorchConv(nn.Module):
    """torch-``nn.Conv2d``-semantics conv (explicit symmetric padding) with
    the same parameter surface as ``nn.Conv`` (kernel [kh,kw,cin,cout] +
    bias [cout]) so checkpoints are interchangeable; dispatches to the
    packed formulation when `conv_packing` is enabled and profitable."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", kaiming_normal, (k, k, x.shape[-1], self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        pack = _pack_factor(x.shape, k, self.stride, self.padding, self.features)
        if _quantizable(x.shape[-1], self.features):
            if _QUANT_PUBLISH and not self.has_variable("quant", "kernel_q"):
                pair = quantize_kernel(kernel)
                self.variable("quant", "kernel_q", lambda: pair[0])
                self.variable("quant", "w_scale", lambda: pair[1])
            if self.has_variable("quant", "kernel_q"):
                y = _int8_conv(
                    x, kernel, self.stride, self.padding,
                    w_q=self.get_variable("quant", "kernel_q"),
                    s_w=self.get_variable("quant", "w_scale"),
                )
            else:
                y = _int8_conv(x, kernel, self.stride, self.padding)
        elif pack > 1:
            y = _packed_conv(x, kernel, pack, self.padding)
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                x, kernel, (self.stride, self.stride),
                ((self.padding, self.padding), (self.padding, self.padding)),
                dimension_numbers=dn,
            )
        if bias is not None:
            y = y + bias
        return y


def conv2d(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    name: str | None = None,
    dtype: Any = jnp.float32,
) -> TorchConv:
    """torch-``nn.Conv2d``-style conv (explicit symmetric padding)."""
    return TorchConv(
        features,
        kernel_size,
        stride,
        padding,
        use_bias,
        dtype,
        name=name,
    )


def batch_norm(
    name: str | None = None,
    axis_name: Optional[str] = None,
    train: bool = False,
    dtype: Any = jnp.float32,
) -> nn.BatchNorm:
    """SyncBN-semantics BN; ``axis_name`` syncs batch stats across replicas."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        axis_name=axis_name if train else None,
        dtype=dtype,
        scale_init=nn.initializers.ones,
        bias_init=bn_bias_init,
        name=name,
    )


def linear(features: int, name: str | None = None, dtype: Any = jnp.float32) -> nn.Dense:
    return nn.Dense(features, kernel_init=kaiming_normal, dtype=dtype, name=name)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)
