"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding is exercised without TPUs (SURVEY.md §4 rebuild strategy)."""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# XLA:CPU AOT cache loads E-log a benign "machine features mismatch" wall per
# entry (the compile-time tuning pseudo-features +prefer-no-scatter/-gather
# never appear in the load-time host feature list); the load still succeeds
# and measured warm-cache speedups confirm hits. Silence C++ logs below FATAL.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU-tunnel plugin ignores JAX_PLATFORMS from the environment; the
# config flag is honored. Must run before any backend initialization.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the model-gradient compiles dominate test
# wall-time; cache them across runs.
_CACHE = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(317)


@pytest.fixture(autouse=True, scope="module")
def _bound_host_memory():
    """Full-suite stability: ~200 tests of jitted real-model graphs keep
    every compiled XLA:CPU executable (with its constant-folded buffers)
    alive in jax's in-memory caches, and the process eventually segfaults
    inside a later big compile (observed twice at
    test_variants.py::test_global_trains_one_step, the largest graph, after
    ~108 tests — passes solo). Dropping the in-memory caches between modules
    once RSS passes a threshold bounds the footprint; the persistent disk
    cache (.cache/jax) makes the re-traces cheap."""
    yield
    import psutil

    if psutil.Process().memory_info().rss > 40e9:
        jax.clear_caches()
