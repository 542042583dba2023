"""Pallas TPU kernels for the framework's hot non-conv ops."""

from fovealseg_tpu.ops.pallas_jfa import (
    nearest_payload_pallas,
    nearest_seed,
    nearest_seed_pallas,
)

__all__ = ["nearest_payload_pallas", "nearest_seed", "nearest_seed_pallas"]
