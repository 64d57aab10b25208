"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform so sharding/mesh tests run
without TPU hardware, and provides the reference's tiered test selection
(--fast / default / --all, conftest.py:4-23 in the reference).
"""
import os

# Must run before jax initializes its backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU tunnel backend via
# jax.config.update("jax_platforms", "axon,cpu"); route tests back to the
# virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: JAX compile time dominates the smoke tiers
# (the fast tier is mostly tracing+XLA-compiling tiny graphs), so cache
# compiled executables across runs. Keyed by jaxlib version internally, so
# stale entries are never replayed. Override the location with
# JAX_TEST_CACHE_DIR; CI restores/saves it via actions/cache.
_cache_dir = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--fast", action="store_true", default=False,
                     help="run only fast tests")
    parser.addoption("--all", action="store_true", default=False,
                     help="run all tests including slow ones")


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: quick smoke tests")
    config.addinivalue_line("markers", "slow: long-running tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--all"):
        return
    if config.getoption("--fast"):
        skip = pytest.mark.skip(reason="only running --fast tests")
        for item in items:
            if "fast" not in item.keywords:
                item.add_marker(skip)
        return
    skip_slow = pytest.mark.skip(reason="slow test: use --all to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
