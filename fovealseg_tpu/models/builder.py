"""Model registry mirroring ``ModelBuilder``
(/root/reference/models/models.py:1146-1230): encoder in {hrnetv2_nodownsp,
segformer, deeplab}, decoder in {c1}, saliency in {fovsimple, resnet zoo},
compress net. Anything else raises, as in the reference."""

from __future__ import annotations

import jax.numpy as jnp


def build_encoder(arch: str = "hrnetv2_nodownsp", fc_dim: int = 960, axis_name=None, dtype=jnp.float32):
    arch = arch.lower()
    if arch == "hrnetv2_nodownsp":
        from fovealseg_tpu.models.hrnet import HRNetV2NoDownsp

        return HRNetV2NoDownsp(axis_name=axis_name, dtype=dtype)
    if arch == "hrnetv2_nodownsp_tiny":
        # structurally identical reduced-depth variant (fast tests/smokes)
        from fovealseg_tpu.models.hrnet import HRNetV2NoDownsp

        return HRNetV2NoDownsp(
            axis_name=axis_name, dtype=dtype,
            stage_modules=(1, 1, 1), num_blocks=1, layer1_blocks=1,
        )
    if arch == "segformer":
        from fovealseg_tpu.models.segformer import SegFormerEncoder

        return SegFormerEncoder(dtype=dtype)
    if arch == "deeplab":
        from fovealseg_tpu.models.deeplab import DeepLabEncoder

        return DeepLabEncoder(axis_name=axis_name, dtype=dtype)
    raise ValueError("Architecture undefined!")


def build_decoder(arch: str = "c1", fc_dim: int = 960, num_class: int = 51, axis_name=None, dtype=jnp.float32, use_softmax: bool = False):
    arch = arch.lower()
    if arch == "c1":
        from fovealseg_tpu.models.c1 import C1

        return C1(num_class=num_class, fc_dim=fc_dim, use_softmax=use_softmax,
                  axis_name=axis_name, dtype=dtype)
    raise ValueError("Architecture undefined!")


def build_net_saliency(name: str = "fovsimple", axis_name=None, dtype=jnp.float32):
    from fovealseg_tpu.models.saliency import build_saliency

    return build_saliency(name, axis_name=axis_name, dtype=dtype)


def build_net_compress(saliency_net: str = "fovsimple", dtype=jnp.float32):
    from fovealseg_tpu.models.saliency import CompressNet

    in_ch = 24 if saliency_net == "fovsimple" else 256
    return CompressNet(in_channels=in_ch, dtype=dtype)
