"""Test configuration: run JAX on a virtual 8-device CPU mesh.

jax is pre-imported at interpreter startup in this environment, so env vars
are too late; jax.config.update works as long as no backend has been
initialized yet (this conftest runs before any test imports touch devices).
The 8 virtual CPU devices stand in for a TPU slice so sharding/collective
paths are exercised without hardware (the 'fake backend' of SURVEY.md §4).
"""

import os

import jax

if os.environ.get("UNET_TPU_TESTS", "0") != "1":
    # XLA_FLAGS is parsed when the (lazy) CPU client first initializes, so
    # appending here still works even though jax is already imported.
    # Backend-O0 halves the compile-dominated suite time (tiny models spend
    # ~90% of wall time in XLA compiles; numerics are level-independent).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
    )
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # Persistent XLA compile cache: the suite is compile-dominated and most
    # programs are identical across runs — reruns during development drop
    # from ~8 min to the execution floor. Cold (CI) runs are unaffected.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
