"""Test configuration: run everything on a fake 8-device CPU mesh.

SURVEY.md §5 item 4: multi-chip behavior is tested without a cluster via
``xla_force_host_platform_device_count`` — the JAX idiom for simulating a
device mesh on host CPU. The axon TPU plugin in this image ignores the
``JAX_PLATFORMS`` env var, so we force CPU via ``jax.config`` (which wins)
before any test imports jax-using modules.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The base environment exports JAX_PLATFORMS=axon (the tunneled-TPU
# plugin). The CLIs re-assert whatever the env var says through
# jax.config (honor_jax_platforms_env), so the env var itself must say
# cpu here — otherwise any CLI-main call inside a test flips the process
# onto the TPU mid-run (ordering-dependent breakage).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
