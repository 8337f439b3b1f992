"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere — this conftest is
imported by pytest before any test module. The 8 virtual CPU devices stand
in for a TPU slice so sharding/collective paths are exercised without
hardware (the 'fake backend' of SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
