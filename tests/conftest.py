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

import pytest  # noqa: E402

# `slow` marks the suite's long tail (the real 2-process distributed run,
# host-scale/multi-chunk aggregation, soaks, subprocess CLI flows) so the
# default `pytest tests/ -q` stays inside the documented window
# (VERDICT round-4 item 4). The round gate runs EVERYTHING:
#   pytest tests/ --runslow -q


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the full round-gate suite)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-tail test, excluded unless --runslow is given"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
