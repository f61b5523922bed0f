"""Test env setup: force an 8-device virtual CPU mesh for unit tests.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup (before conftest), so env vars alone are too late.
Backend *initialization* is still lazy, so flipping jax_platforms via
jax.config here (before any jax.devices()/computation) reliably selects
CPU. Set SCAE_TPU_TEST_PLATFORM=tpu to run the suite on the real chip.
"""

import os

import jax

if os.environ.get("SCAE_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is compile-bound on this
# 1-core box (every test jits afresh); warm runs skip straight to
# execution. Scoped to the CPU test platform (the TPU path compiles
# remotely where the cache is ineffective anyway).
if os.environ.get("SCAE_TPU_TEST_PLATFORM", "cpu") == "cpu":
    _cache_dir = os.environ.get(
        "SCAE_TPU_TEST_CACHE",
        os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() in ("cpu", "tpu"), jax.default_backend()
