"""Test configuration: force CPU with 8 virtual devices (JAX's standard
fake-multi-device mechanism) so sharding tests run without a TPU.

The container's sitecustomize pins JAX_PLATFORMS=axon (remote TPU tunnel), so
an env var is not enough — we override via jax.config before first backend
use. A persistent compilation cache keeps repeated UNet compiles fast.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
