"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference "tests" multi-device only by hand-pinning processes to GPUs
(``cudaSetDevice``; SURVEY.md §4).  Here the CPU backend with
``--xla_force_host_platform_device_count=8`` is the fake multi-chip backend
the reference lacks: all sharding paths compile and execute in CI without
TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU pin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin before conftest runs
# and wins over JAX_PLATFORMS; this config update (before any backend init)
# wins back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles ~100 scanned programs;
# repeat runs hit the cache instead.
jax.config.update("jax_compilation_cache_dir", "/tmp/pmpx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
