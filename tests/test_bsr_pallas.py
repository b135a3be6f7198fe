"""Pallas BELL kernels vs the XLA formulation and the CPU oracle.

Runs in interpreter mode on the CPU test mesh (conftest pins
JAX_PLATFORMS=cpu); the kernels themselves are identical to what executes
on TPU hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sblas_tpu.containers import DenseMatrix, DenseVector
from sblas_tpu.io.generate import fem_banded_like, uniform_random
from sblas_tpu.ops.bsr import BsrPlan, spmm_bsr, spmv_bsr
from sblas_tpu.ops.bsr_pallas import spmm_bsr_pallas
from sblas_tpu.ops.cpu_reference import spmm_cpu, spmv_cpu
from sblas_tpu.utils.verify import assert_equal


@pytest.fixture(scope="module")
def banded():
    return fem_banded_like(n=700, half_band=9, dtype=np.float64)


@pytest.fixture(scope="module")
def blocky():
    return uniform_random(300, 260, nnz_per_row=5, seed=3, dtype=np.float64)


@pytest.mark.parametrize("alpha,beta", [(1.0, 1.0), (3.0, 4.0), (2.5, 0.0)])
def test_spmm_matches_oracle(banded, alpha, beta):
    plan = BsrPlan.from_csr(banded, dtype=jnp.float64, block=(128, 128))
    B = DenseMatrix.random(banded.width, 17)
    C = DenseMatrix.constant(banded.height, 17, 1.0)
    got = spmm_bsr_pallas(plan, jnp.asarray(B.values), alpha, beta,
                          jnp.asarray(C.values))
    want = spmm_cpu(banded, B, alpha, beta, C)
    assert_equal(np.asarray(got), want)


def test_spmm_matches_xla_path(blocky):
    plan = BsrPlan.from_csr(blocky, dtype=jnp.float64, block=(128, 128))
    B = DenseMatrix.random(blocky.width, 33)
    C = DenseMatrix.random(blocky.height, 33)
    got = spmm_bsr_pallas(plan, jnp.asarray(B.values), 3.0, 4.0,
                          jnp.asarray(C.values))
    want = spmm_bsr(plan, jnp.asarray(B.values), 3.0, 4.0,
                    jnp.asarray(C.values))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)
