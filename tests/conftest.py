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
# the suite is dominated by XLA:CPU compiles of the big pipeline jits;
# cache them across runs (first run pays, reruns are minutes faster)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ellc_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
