"""Test config: run everything on CPU with 8 virtual devices so shard_map /
psum paths are exercised for real (SURVEY.md §4 implication).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
we must force the platform via jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache for the jitted tests (measured: the suite is
# trace/dispatch-bound rather than compile-bound, so the win is small — but
# the cache is free and helps the heavier jit tests on repeated runs)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
