"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the 'fake backend' of SURVEY.md S5: every collective/sharded path is
exercised on a virtual 8-device CPU mesh, no TPUs needed. fp64 is enabled so
oracle comparisons are tight; fp32-specific tests cast explicitly.

NOTE the environment's sitecustomize pre-registers a remote-TPU ('axon')
backend and pins jax_platforms in *config*, so the JAX_PLATFORMS env var is
not sufficient — we must override the config value after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
