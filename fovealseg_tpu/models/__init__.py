from fovealseg_tpu.models.builder import (
    build_decoder,
    build_encoder,
    build_net_compress,
    build_net_saliency,
)
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

__all__ = [
    "build_decoder",
    "build_encoder",
    "build_net_compress",
    "build_net_saliency",
    "DeformConfig",
    "DeformSegmentation",
]
