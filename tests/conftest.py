"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64 enabled.

The environment's sitecustomize registers the axon TPU plugin and forces
jax_platforms programmatically, so the JAX_PLATFORMS env var alone is not
enough — we must override via jax.config before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: XLA compiles of the scan-heavy programs dominate
# test runtime; cache them across runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
