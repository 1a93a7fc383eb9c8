"""Persistent XLA compilation cache.

First compiles through the remote TPU tunnel cost 20-250 s; enabling JAX's
persistent compilation cache makes every later process (driver bench runs,
CLI invocations, tests) reuse the serialized executables keyed by HLO.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/openpose_tpu_xla")


def _machine_tag() -> str:
    """Short hash of the host CPU feature flags (stable per machine)."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Best-effort: turn on the JAX persistent compilation cache.

    Returns True if the cache was enabled. Safe to call multiple times and
    after backend initialization (the cache config is not backend-pinned).
    """
    import jax

    path = cache_dir or os.environ.get("OPENPOSE_TPU_XLA_CACHE", _DEFAULT_DIR)
    try:
        # Partition by host CPU features: XLA:CPU AOT entries baked for a
        # different microarchitecture load with "could lead to SIGILL"
        # warnings when the cache directory moves between machines.
        path = os.path.join(path, _machine_tag())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
