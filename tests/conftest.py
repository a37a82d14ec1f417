"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 strategy: multi-chip sharding is validated without
TPU hardware by forcing the CPU backend with 8 virtual devices; the TPU
path itself is exercised by bench.py / the driver on real hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The sandbox's axon PJRT plugin force-sets jax_platforms="axon,cpu" at
# registration, overriding the JAX_PLATFORMS env var — so select the CPU
# backend through the config API instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xCCFB2D5055D8C990 % 2**32)
