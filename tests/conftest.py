"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (the driver separately dry-runs multi-chip compiles).

Note: this environment preloads jax via sitecustomize and pins
JAX_PLATFORMS=axon (the TPU tunnel), so we must switch platforms via
jax.config *after* import — env vars alone are ignored.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
