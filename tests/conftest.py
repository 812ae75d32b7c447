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

# Persistent compilation cache: the test subset compiles dozens of tiny
# train/infer programs; on this 1-core VM those compiles dominate wall time.
# A repo-local disk cache makes consecutive runs (and xdist workers) reuse
# them, keeping the default subset comfortably under the 10-minute budget.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
