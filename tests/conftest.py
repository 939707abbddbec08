"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require the real TPU; sharding logic is exercised on
xla_force_host_platform_device_count=8 as the survey's test strategy
prescribes (SURVEY.md section 4: multi-host tests = same protocol under
1-chip and sharded meshes with identical transcripts).
"""

import os
import random
import sys

# Force CPU before any backend initializes. The container's sitecustomize
# registers the axon TPU plugin and pre-imports jax, so plain env vars are
# not enough — update the live jax config too. Backends init lazily, so the
# XLA_FLAGS device-count flag still takes effect here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the fused whole-proof programs (unrolled SHA-256
# chains, GSPMD-partitioned over the 8-device mesh) take minutes to compile
# on CPU; caching them makes repeat suite runs cheap. Safe for concurrent
# processes (atomic writes).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture
def rng():
    """Deterministic RNG (the analogue of ark_std::test_rng())."""
    return random.Random(0)
