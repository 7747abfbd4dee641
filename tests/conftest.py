"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on xla_force_host_platform_device_count=8
CPU devices; numerics tests get deterministic CPU float behavior.

Note: this environment registers a TPU PJRT plugin from sitecustomize,
which overrides the JAX_PLATFORMS env var — so the CPU platform is forced
via jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
