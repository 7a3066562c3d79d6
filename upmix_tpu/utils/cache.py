"""Persistent compilation cache.

Each CLI invocation is a fresh process, so without a persistent cache the
pipeline recompiles every run (measured ~4.5 s for a small config; tens of
seconds for the default 6-band config).  Enabling JAX's compilation cache
cuts warm starts ~3.5x (measured 4.5 s -> 1.3 s)."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache.

    Precedence: explicit arg > JAX_COMPILATION_CACHE_DIR env >
    ~/.cache/upmix_tpu/jax.  Returns the directory in effect, or "" when
    the directory cannot be created (cache silently disabled — e.g.
    read-only HOME in containers).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "upmix_tpu", "jax"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
