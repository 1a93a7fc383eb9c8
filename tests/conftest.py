"""Test config: force the CPU backend with 8 virtual devices so sharding tests
run anywhere (the real-TPU env exposes one remote chip via the axon plugin,
which pins jax_platforms at interpreter start — override it here, before any
backend is initialized)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
