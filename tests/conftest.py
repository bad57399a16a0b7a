"""Test configuration: force an 8-device virtual CPU platform so sharding
tests can exercise a v5e-8-shaped mesh without TPU hardware."""

import os

# force CPU: the suite targets an 8-device virtual mesh, and numeric golden
# tests assume f32 host numerics (the driver benches on real TPU separately)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize imports jax before conftest runs, so the
# JAX_PLATFORMS env var was already snapshotted (possibly as a TPU platform);
# override through the config API, which wins over the stale snapshot
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: full-suite runs re-use kernels across sessions
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
