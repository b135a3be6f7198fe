"""Plan serialization: save/load round trip for every plan type."""

import numpy as np
import pytest

import jax.numpy as jnp

from sblas_tpu.containers import DenseVector
from sblas_tpu.io.generate import fem_banded_like, uniform_random
from sblas_tpu.io.plancache import load_plan, save_plan
from sblas_tpu.ops import make_plan, spmv
from sblas_tpu.ops.rspmv import RoutedPlan


@pytest.mark.parametrize("kind", ["dia", "bsr", "ell", "wcoo", "coo"])
def test_roundtrip_structured(tmp_path, kind):
    A = fem_banded_like(n=600, half_band=5, dtype=np.float64)
    plan = make_plan(A, dtype=jnp.float64, force=kind)
    p = tmp_path / f"{kind}.npz"
    save_plan(str(p), plan)
    plan2 = load_plan(str(p))
    assert type(plan2) is type(plan)
    x = DenseVector.random(A.width)
    y = DenseVector.constant(A.height, 1.0)
    a = spmv(plan, jnp.asarray(x.values), 3.0, 4.0, jnp.asarray(y.values))
    b = spmv(plan2, jnp.asarray(x.values), 3.0, 4.0, jnp.asarray(y.values))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_routed(tmp_path):
    A = uniform_random(2000, 70000, 3, seed=4)
    plan = RoutedPlan.from_csr(A, dtype=jnp.float64)
    p = tmp_path / "routed.npz"
    save_plan(str(p), plan)
    plan2 = load_plan(str(p))
    assert plan2.schedule == plan.schedule
    assert plan2.unrank_schedule == plan.unrank_schedule
    x = DenseVector.random(A.width)
    y = DenseVector.constant(A.height, 1.0)
    a = spmv(plan, jnp.asarray(x.values), 2.0, 3.0, jnp.asarray(y.values))
    b = spmv(plan2, jnp.asarray(x.values), 2.0, 3.0, jnp.asarray(y.values))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
