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


def test_dtype_guard_rejects_canonicalization(tmp_path):
    """A plan whose stored dtype the current config cannot reproduce must
    fail loudly, not silently downcast (ADVICE r1)."""
    import json

    from sblas_tpu.utils.errors import FormatError

    A = fem_banded_like(n=300, half_band=4, dtype=np.float64)
    plan = make_plan(A, dtype=jnp.float64, force="ell")
    p = tmp_path / "guard.npz"
    save_plan(str(p), plan)
    # tamper the recorded intent: claim the values were float16 — the
    # loader must notice loaded-dtype != recorded-dtype and raise
    with np.load(str(p)) as z:
        blobs = {k: z[k] for k in z.files}
    meta = json.loads(bytes(blobs["__meta__"]).decode())
    key = next(k for k in meta["__dtypes__"] if meta["__dtypes__"][k]
               == "float64")
    meta["__dtypes__"][key] = "float16"
    blobs["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                      dtype=np.uint8)
    np.savez_compressed(str(p), **blobs)
    with pytest.raises(FormatError):
        load_plan(str(p))


def test_dtype_recorded(tmp_path):
    A = fem_banded_like(n=300, half_band=4, dtype=np.float64)
    plan = make_plan(A, dtype=jnp.float64, force="coo")
    p = tmp_path / "rec.npz"
    save_plan(str(p), plan)
    plan2 = load_plan(str(p))
    assert plan2.vals.dtype == plan.vals.dtype


def test_load_pre_dtype_record_files(tmp_path):
    """Files saved before the dtype record existed (round 1) still load."""
    import json

    A = fem_banded_like(n=300, half_band=4, dtype=np.float64)
    plan = make_plan(A, dtype=jnp.float64, force="ell")
    p = tmp_path / "old.npz"
    save_plan(str(p), plan)
    with np.load(str(p)) as z:
        blobs = {k: z[k] for k in z.files}
    meta = json.loads(bytes(blobs["__meta__"]).decode())
    meta.pop("__dtypes__")  # simulate a round-1 file
    blobs["__meta__"] = np.frombuffer(json.dumps(meta).encode(),
                                      dtype=np.uint8)
    np.savez_compressed(str(p), **blobs)
    plan2 = load_plan(str(p))
    assert type(plan2) is type(plan)
