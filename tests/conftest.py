"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY.md §4 item 4).

Note: this image's sitecustomize imports jax (axon TPU plugin registration)
at interpreter startup, so env vars set here are too late for JAX_PLATFORMS;
backends initialize lazily though, so jax.config.update still applies.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

# Persistent compilation cache: the suite is dominated by jit compiles
# (~10 of its ~13 minutes); repeat runs reuse compiled executables.
jax.config.update("jax_compilation_cache_dir", "/tmp/obman_jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
