"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference can only exercise its multi-GPU paths on real hardware; we test
both distribution modes without any TPU by forcing the XLA host platform to
expose 8 devices (SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os

# Force CPU even when the session env pins a TPU platform (e.g.
# JAX_PLATFORMS=axon): tests exercise sharding on a virtual mesh.  A pytest
# plugin imports jax before this conftest runs, so env vars alone are too
# late — use config updates, which take effect until backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Double precision on the CPU test mesh: lets us verify at the reference's
# 1e-3 *absolute* tolerance exactly as its double-precision drivers do.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from sblas_tpu.containers import CsrMatrix  # noqa: E402

REFERENCE_ASH85 = "/root/reference/ash85.mtx"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process bootstrap etc.)")


@pytest.fixture(scope="session")
def ash85() -> CsrMatrix:
    """The reference's checked-in fixture, read from the read-only mount;
    falls back to a structure-matched synthetic when absent."""
    if os.path.exists(REFERENCE_ASH85):
        return CsrMatrix.from_mtx(REFERENCE_ASH85)
    from sblas_tpu.io.generate import pattern_symmetric
    return pattern_symmetric()


@pytest.fixture(scope="session")
def rng() -> np.random.RandomState:
    return np.random.RandomState(0)
