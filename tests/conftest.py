"""Test configuration.

Forces the JAX CPU backend with 8 virtual devices BEFORE jax initializes,
so sharding / data-parallel tests run without real multi-chip hardware
(SURVEY.md §4 "distributed-without-a-cluster"). Must run before any test
module imports jax.
"""

import os

# Force-set (the box presets JAX_PLATFORMS=axon for the real TPU chip; the
# axon plugin ignores a shell-level override, so also set jax.config below).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp32 matmuls on CPU for tight numeric comparisons against torch
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
