"""Persistent XLA compilation cache.

First compiles through the remote TPU tunnel cost 20-250 s; enabling JAX's
persistent compilation cache makes every later process (driver bench runs,
CLI invocations, tests) reuse the serialized executables keyed by HLO.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/openpose_tpu_xla")


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Best-effort: turn on the JAX persistent compilation cache.

    Returns True if the cache was enabled. Safe to call multiple times and
    after backend initialization (the cache config is not backend-pinned).
    """
    import jax

    path = cache_dir or os.environ.get("OPENPOSE_TPU_XLA_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
