"""Distributed modes over per-shard fast plans, on the virtual CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from sblas_tpu.containers import DenseMatrix, DenseVector
from sblas_tpu.io.generate import (adversarial_skew, fem_banded_like,
                                   uniform_random)
from sblas_tpu.ops.cpu_reference import spmm_cpu, spmv_cpu
from sblas_tpu.parallel import (make_mesh, partition_halo_dia,
                                partition_row_plans, spmm_mode2_planned,
                                spmv_dist_planned, spmv_halo_planned,
                                sync_to_host)
from sblas_tpu.utils.verify import assert_equal

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(N_DEV)


@pytest.fixture(scope="module")
def banded():
    return fem_banded_like(n=1100, half_band=6, dtype=np.float64)


@pytest.fixture(scope="module")
def ragged():
    return uniform_random(900, 700, nnz_per_row=5, seed=11, dtype=np.float64)


@pytest.mark.parametrize("kind", ["bsr", "ell", "dia"])
@pytest.mark.parametrize("reduce", ["psum", "psum_scatter"])
def test_spmm_mode2_planned(mesh, banded, kind, reduce):
    shards = partition_row_plans(banded, N_DEV, dtype=jnp.float64, kind=kind)
    assert shards.kind == kind
    B = DenseMatrix.random(banded.width, 9)
    C = DenseMatrix.constant(banded.height, 9, 1.0)
    got = sync_to_host(spmm_mode2_planned(
        shards, jnp.asarray(B.values), 3.0, 4.0, jnp.asarray(C.values),
        mesh, reduce=reduce))
    assert_equal(np.asarray(got), spmm_cpu(banded, B, 3.0, 4.0, C))


@pytest.mark.parametrize("reduce", ["psum", "psum_scatter"])
def test_spmv_dist_planned(mesh, ragged, reduce):
    shards = partition_row_plans(ragged, N_DEV, dtype=jnp.float64)
    x = DenseVector.random(ragged.width)
    y = DenseVector.constant(ragged.height, 1.0)
    got = sync_to_host(spmv_dist_planned(
        shards, jnp.asarray(x.values), 3.0, 4.0, jnp.asarray(y.values),
        mesh, reduce=reduce))
    assert_equal(np.asarray(got), spmv_cpu(ragged, x, 3.0, 4.0, y))


def test_spmv_dist_planned_skewed(mesh):
    A = adversarial_skew(m=1024, n=1024, heavy_rows=2, heavy_nnz=512,
                         dtype=np.float64)
    shards = partition_row_plans(A, N_DEV, dtype=jnp.float64, kind="ell")
    x = DenseVector.random(A.width)
    y = DenseVector.constant(A.height, 1.0)
    got = sync_to_host(spmv_dist_planned(
        shards, jnp.asarray(x.values), 2.0, 1.0, jnp.asarray(y.values),
        mesh))
    assert_equal(np.asarray(got), spmv_cpu(A, x, 2.0, 1.0, y))


def test_spmv_halo_planned(mesh, banded):
    shards = partition_halo_dia(banded, N_DEV, dtype=jnp.float64)
    x = DenseVector.random(banded.width)
    y = DenseVector.constant(banded.height, 1.0)
    got = sync_to_host(spmv_halo_planned(
        shards, jnp.asarray(x.values), 3.0, 4.0, jnp.asarray(y.values),
        mesh))
    assert_equal(np.asarray(got), spmv_cpu(banded, x, 3.0, 4.0, y))


def test_default_kind_selection(ragged):
    wide_band = fem_banded_like(n=700, half_band=40, dtype=np.float64)
    assert partition_row_plans(wide_band, 4).kind == "bsr"
    assert partition_row_plans(ragged, 4).kind == "ell"
