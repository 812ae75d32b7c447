"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests (mesh/pjit paths) run without TPU hardware.

Note: this environment registers a TPU ('axon') PJRT plugin from
sitecustomize at interpreter start and pins JAX_PLATFORMS, so the env var
alone is not enough — jax.config.update after import is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
