"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's (nonexistent) fake-backend
multi-node testing — see SURVEY.md §4. Environment must be set before jax
import, hence the top-of-file assignments.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's TPU plugin (axon) force-overrides jax_platforms at
# interpreter start from sitecustomize, so the env var alone is not enough —
# re-pin the config here, before any backend is initialized. This both keeps
# tests deterministic-f32 (TPU matmuls default to bf16) and avoids a ~90s
# remote-TPU claim per test process.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this 2-CPU
# host; repeated runs hit the cache and finish in a fraction of the time.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
