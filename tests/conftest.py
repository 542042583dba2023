"""Test env: force CPU with 8 virtual devices (the TPU-native analogue of the
reference's local-2-GPU SyncBN simulation — SURVEY.md §4) so multi-device
sharding tests run without a TPU slice."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(304)  # TRAIN.seed default
