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

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
bn_bias_init = nn.initializers.constant(1e-4)


def conv2d(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    name: str | None = None,
    dtype: Any = jnp.float32,
) -> nn.Conv:
    """torch-``nn.Conv2d``-style conv (explicit symmetric padding)."""
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        kernel_init=kaiming_normal,
        dtype=dtype,
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
