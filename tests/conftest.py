"""Test configuration: force an 8-virtual-device CPU backend.

All tests (including multi-chip sharding tests) run on CPU with
``xla_force_host_platform_device_count=8`` — the idiomatic JAX fake backend
for pjit/shard_map code (SURVEY.md §4).  Must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The environment's sitecustomize may force jax_platforms to the TPU plugin
# via jax.config (overriding the env var); force CPU back for tests.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many small model graphs;
# warm runs skip recompilation entirely.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
