"""Root pytest config.

Tests run on CPU with 8 virtual devices so that every sharding / collective
code path is exercised without a real TPU slice (the JAX idiom the reference
could not use for its NCCL path: see SURVEY.md section 4).

The env vars MUST be set before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep single-core CI machines from oversubscribing.
os.environ.setdefault("OMP_NUM_THREADS", "1")
# Don't let the hundreds of tiny test compiles populate the user's
# persistent compilation cache (utils/compile_cache.py); the dedicated
# tests/test_compile_cache.py passes an explicit tmp dir instead.
os.environ.setdefault("IMGSEG_COMPILE_CACHE", "off")

# Force CPU even when a site hook pre-registers a TPU platform AND sets the
# jax_platforms CONFIG (which overrides the JAX_PLATFORMS env var); set
# IMGSEG_TEST_REAL_TPU=1 to run tests on real hardware.
if not os.environ.get("IMGSEG_TEST_REAL_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
