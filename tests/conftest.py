"""Test harness configuration.

Runs the suite on a virtual 8-device CPU mesh so multi-chip sharding logic
is exercised without TPU hardware.  The container presets
``JAX_PLATFORMS=axon`` and a sitecustomize that registers the TPU-tunnel
backend at interpreter start, so the env var alone cannot opt out; the
``jax.config.update`` below (before any backend is instantiated) does.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: the persistent compilation cache (round 2-3: /tmp/jax_cache_...)
# is deliberately OFF.  On this jax build, reading back certain large
# XLA:CPU executables from the on-disk cache segfaults the interpreter
# inside compilation_cache.get_executable_and_time (reproduced twice on
# a freshly-cleared cache dir, round 4); cold compiles are slower but
# deterministic.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults (in backend_compile_and_load / cache read) after
    many large pipeline compiles accumulate in one process (reproduced
    twice, round 4, always ~65 tests in); dropping compiled executables
    between modules bounds the compile-state footprint.  Cross-module
    cache hits are rare anyway (modules use different configs/shapes)."""
    yield
    jax.clear_caches()
