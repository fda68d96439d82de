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
