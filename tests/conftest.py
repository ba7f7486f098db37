"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise a real Mesh without TPU hardware, per the build environment
contract."""

import os

# The harness env pins JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# a virtual 8-device CPU platform. jax.config wins over the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
