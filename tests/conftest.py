"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised separately by bench.py / the driver; unit and
integration tests validate numerics and sharding on host CPU so they are
hermetic and fast (mirrors the reference's CPU-only unit tier,
ref: .github/workflows/run-unit-tests.yaml).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) registers itself regardless of
# JAX_PLATFORMS; force the CPU backend explicitly for hermetic tests.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fixtures_dir():
    """Reference 20s FLAC fixtures (read-only)."""
    return "/root/reference/tests/inputs"


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Bound memory across the suite: compiled executables for the many
    parity-test shapes otherwise accumulate to an OOM abort."""
    yield
    jax.clear_caches()
    import gc

    gc.collect()
