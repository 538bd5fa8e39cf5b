"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (the driver validates real-TPU paths separately).

Note: the environment's axon sitecustomize programmatically selects the TPU
platform at interpreter start, which overrides JAX_PLATFORMS env vars — so
we must win it back via jax.config after import (backend must not be
initialized yet, hence this lives in conftest before any jax use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persist compiled executables across test runs (the jitted curve kernels
# have large graphs; cold compiles dominate otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
