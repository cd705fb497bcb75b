"""Persistent XLA compilation cache.

Remote/tunneled TPU compiles of the full training graph are expensive
(minutes); the persistent cache makes every later process start instantly
for unchanged graphs. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SVRS_COMPILATION_CACHE", os.path.expanduser("~/.cache/svrs_jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
