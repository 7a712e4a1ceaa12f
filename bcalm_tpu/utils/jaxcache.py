"""Persistent XLA compilation cache setup.

TPU compiles in this environment go through a remote compile service with
high and variable latency (minutes per new shape); the persistent cache
makes every shape a one-time cost across processes and runs.
"""

from __future__ import annotations

import os


def enable_cache(cache_dir: str | None = None) -> str | None:
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("BTPU_JAX_CACHE")
        or os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
