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
def _collect_between_modules():
    """Release dead arrays between modules to bound suite memory.

    Deliberately does NOT call ``jax.clear_caches()``: clearing live XLA:CPU
    executables mid-session corrupts the heap in this jaxlib (deterministic
    ``double free or corruption (out)`` abort a few allocations later —
    bisected to the clear via tests/test_htdemucs.py::
    test_demucs_separator_end_to_end + tests/test_vr.py::
    test_vr_separator_end_to_end). Compiled-program accumulation across the
    suite stays well under this machine's RAM.
    """
    yield
    import gc

    gc.collect()
