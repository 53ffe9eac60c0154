import os

import pytest

# 8 virtual CPU devices so multi-chip sharding paths are testable without TPUs
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache (core.config.enable_compilation_cache):
# the kill-and-resume / two-process / CLI tests spawn subprocesses that
# would recompile kernels the parent already built, and repeat suite runs
# recompile everything. LCF_COMPILATION_CACHE is honored by the package at
# import, so spawned subprocesses inherit it through the environment.
# LCF_NO_TEST_CACHE=1 opts out (e.g. to time cold compiles).
if not os.environ.get("LCF_NO_TEST_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), ".xla_cache")
    os.makedirs(_cache_dir, exist_ok=True)
    os.environ.setdefault("LCF_COMPILATION_CACHE", _cache_dir)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon env pins JAX_PLATFORMS=tpu-tunnel
jax.config.update("jax_enable_x64", True)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (long statistical runs)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long statistical/integration runs, skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
