"""Persistent XLA compile cache shared by every entry point.

The flagship 480p compiles are expensive (training step ~2 min, detector
scan ~8 min on the tunneled chip); the persistent cache in
<repo>/.cache/jax makes every later process with the same shapes start
warm. tests/conftest.py configures the same directory.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache() -> str:
    """Point jax at the repo-local compile cache. Call after importing jax,
    before the first compilation. Safe to call repeatedly.

    Also honors a JAX_PLATFORMS env var through the config flag: the axon
    TPU-tunnel plugin ignores the env var alone, so JAX_PLATFORMS=cpu would
    otherwise still land every CLI on the tunnel (same workaround as
    tests/conftest.py and __graft_entry__.py)."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass  # backend already initialized; env choice stands

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache", "jax",
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
