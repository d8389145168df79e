"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; real multi-chip TPU
hardware is not available in CI, so we ask XLA for 8 host (CPU) devices.
Must be set before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The config API wins even if a site hook already registered/initialised a
# TPU backend plugin before pytest started.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles hundreds of XLA CPU executables in one process;
    with everything kept alive by jax's global jit cache, XLA's CPU
    backend_compile segfaulted deterministically at ~test 149/193 (twice,
    same test, also with the pre-change tree — jax/jaxlib 0.9.0).  Any
    module subset passes.  Dropping the caches at module boundaries keeps
    the live-executable count bounded."""
    yield
    jax.clear_caches()
