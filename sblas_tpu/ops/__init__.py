"""Ops layer: single-chip SpMV/SpMM kernels + CPU oracle.

Analog of the reference's ops headers (spmm.h / spmv.h behind sblas.h)."""

from . import cpu_reference  # noqa: F401
from .elementwise import axpby, plus_scalar  # noqa: F401
from .plans import CooPlan, EllPlan  # noqa: F401
from .spmm import spmm, spmm_coo, spmm_ell  # noqa: F401
from .spmv import spmv, spmv_coo, spmv_ell  # noqa: F401

from ..config import DEFAULT


def make_plan(A, dtype=None, config=DEFAULT, force=None):
    """Choose the best single-chip layout for CSR matrix `A`.

    `force` in {"coo", "ell"} overrides the heuristic (ELL when row
    occupancy is balanced enough, see EllPlan.is_profitable)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    kind = force or ("ell" if EllPlan.is_profitable(A, config) else "coo")
    if kind == "ell":
        return EllPlan.from_csr(A, dtype=dtype, config=config)
    if kind == "coo":
        return CooPlan.from_csr(A, dtype=dtype, config=config)
    raise ValueError(f"unknown plan kind {kind!r}")
