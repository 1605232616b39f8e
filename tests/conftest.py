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
