"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (the driver benches on the real chip).

The axon sitecustomize force-registers the TPU backend regardless of
JAX_PLATFORMS, so the platform must be overridden via jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fast gate is compile-dominated (every
# env test compiles a full step graph); caching compiled executables across
# runs/processes cuts repeat gate time several-fold.  File-based and safe
# under xdist (atomic writes, content-hashed keys).  Delete .pytest_jax_cache
# to measure a cold gate.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".pytest_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
