"""Test env: force CPU with 8 virtual devices (the TPU-native analogue of the
reference's local-2-GPU SyncBN simulation — SURVEY.md §4) so multi-device
sharding tests run without a TPU slice.

NOTE: this image pins jax_platforms to "axon,cpu" at import, preempting the
JAX_PLATFORMS env var — jax.config.update is the only reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(304)  # TRAIN.seed default
