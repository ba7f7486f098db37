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

# CPU tests get their OWN cache dir, separate from the TPU bench cache:
# persistent-cache CPU executables are AOT-compiled for the machine that
# wrote them, and a cache carried across hosts loads with "machine type
# doesn't match ... could lead to SIGILL" warnings — observed crashing a
# full-suite run mid-way (r5f session). A host-keyed dir keeps reuse within
# one machine and guarantees a fresh cache on a new one.
import platform as _platform

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_smallpt_cpu_{_platform.node() or 'host'}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between modules: one-process full-suite
    runs accumulate ~300 XLA:CPU programs and deterministically segfault/
    abort inside LLVM compilation around test #250 (r5f/r5g sessions, four
    runs, idle host included; any two-module subset passes). Per-module
    cache clearing caps the live-executable population; CPU recompiles are
    cheap and the persistent cache covers the big ones."""
    yield
    jax.clear_caches()
