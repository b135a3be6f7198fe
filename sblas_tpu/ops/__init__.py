"""Ops layer: single-chip SpMV/SpMM kernels + CPU oracle.

Analog of the reference's ops headers (spmm.h / spmv.h behind sblas.h).
Six device layouts, chosen by `make_plan`:

* DIA diagonal (shift-and-FMA) — banded structure, SpMV planning;
* Routed (gather/route/stack engine) — large unstructured, SpMV planning;
* BELL block-sparse (MXU batched matmuls) — block-friendly structure;
* ELL (gather-only VPU) — balanced row occupancy;
* windowed COO (block gather + one-hot MXU window reduce) — unstructured;
* padded COO (gather + sorted segment_sum) — universal fallback.
"""

from . import cpu_reference  # noqa: F401
from .bsr import BsrPlan, bell_stats, spmm_bsr, spmv_bsr  # noqa: F401
from .bsr_pallas import spmm_bsr_pallas  # noqa: F401
from .dia import DiaPlan, dia_stats, spmm_dia, spmv_dia  # noqa: F401
from .elementwise import axpby, plus_scalar  # noqa: F401
from .plans import CooPlan, EllPlan  # noqa: F401
from .rspmv import RoutedPlan, spmv_routed  # noqa: F401
from .spmm import spmm_coo, spmm_ell  # noqa: F401
from .spmv import spmv_coo, spmv_ell  # noqa: F401
from .wcoo import WcooPlan, spmm_wcoo, spmv_wcoo  # noqa: F401

from ..config import DEFAULT

# Windowed-COO tile-split overhead beyond which plain COO is used instead
# (only near-empty matrices with huge row gaps get close).
_WCOO_FILL_LIMIT = 8.0

# B width at which the Pallas scalar-prefetch BELL kernel overtakes the XLA
# formulation: the XLA path materializes a gathered B copy per slot
# (traffic grows with K), the Pallas path streams (C, K) tiles straight to
# VMEM.  Measured crossover on v5e: K=64 XLA 2100 GF/s vs Pallas 960;
# K=256 XLA 1620 vs Pallas 1918.
_BSR_PALLAS_MIN_K = 256


def make_plan(A, dtype=None, config=DEFAULT, force=None, op=None):
    """Choose the best single-chip layout for CSR matrix `A`.

    Heuristic order for SpMV planning: DIA (shift-and-FMA) when banded,
    routed (three-stage gather/route/stack engine) for large unstructured
    matrices, then the mixed-use ladder.  For SpMM / mixed use: BSR (MXU
    blocks) when block-friendly, DIA when the diagonal count is small
    (measured v5e on the s3dkq4m2 shell proxy, K=64: DIA 2.0 ms vs ELL
    14.9 ms vs tier-0 57 ms — B re-reads per diagonal beat per-slot row
    gathers whenever blowup is low), ELL when rows are balanced,
    windowed-COO otherwise, plain COO as the universal fallback.  `force`
    in {"dia", "routed", "bsr", "ell", "wcoo", "coo"} overrides; `op` in
    {None, "spmv", "spmm"} biases the choice toward that kernel (routed is
    SpMV-only and never auto-chosen for mixed use)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    kind = force
    if kind is None:
        if op == "spmv" and DiaPlan.is_profitable(A, config):
            kind = "dia"
        elif (op == "spmv" and RoutedPlan.is_profitable(A, config)
              and bell_stats(A, config.bsr_block)["blowup"]
              > config.bsr_blowup_limit):
            kind = "routed"
        elif bell_stats(A, config.bsr_block)["blowup"] <= config.bsr_blowup_limit:
            kind = "bsr"
        elif DiaPlan.is_profitable(A, config):
            kind = "dia"
        elif EllPlan.is_profitable(A, config):
            kind = "ell"
        else:
            plan = WcooPlan.from_csr(A, dtype=dtype, config=config)
            if plan.fill_ratio <= _WCOO_FILL_LIMIT:
                return plan
            kind = "coo"
    if kind == "dia":
        return DiaPlan.from_csr(A, dtype=dtype, config=config)
    if kind == "routed":
        return RoutedPlan.from_csr(A, dtype=dtype, config=config)
    if kind == "bsr":
        return BsrPlan.from_csr(A, dtype=dtype, block=config.bsr_block,
                                config=config)
    if kind == "ell":
        return EllPlan.from_csr(A, dtype=dtype, config=config)
    if kind == "wcoo":
        return WcooPlan.from_csr(A, dtype=dtype, config=config)
    if kind == "coo":
        return CooPlan.from_csr(A, dtype=dtype, config=config)
    raise ValueError(f"unknown plan kind {kind!r}")


def make_plan_fast(A, dtype=None, config=DEFAULT):
    """Millisecond-build plan for progressive delivery (VERDICT r4
    next#2): ELL when the row distribution allows it, COO otherwise —
    both are O(nnz) array reshuffles with no analysis phase.

    The cold-start contract: `make_plan` on a 1M-row unstructured matrix
    pays ~30-45 s of routed-plan analysis (edge coloring) before the
    first result; the reference's fscanf load answers in seconds
    (spmv_test.cu:44-60).  Serving the first call from this plan and
    hot-swapping to the routed plan when its build (or cached load)
    completes closes that UX gap — plans are immutable pytrees, so the
    swap is a pointer exchange (cli/spmv_test.py --progressive)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    if EllPlan.is_profitable(A, config):
        return EllPlan.from_csr(A, dtype=dtype, config=config)
    return CooPlan.from_csr(A, dtype=dtype, config=config)


def _plan_dtype(plan):
    """Value dtype of any plan kind (RoutedPlan stores values as gvals)."""
    return (plan.gvals if isinstance(plan, RoutedPlan)
            else plan.vals).dtype


def spmv(plan, x, alpha=1.0, beta=1.0, y=None):
    """y' = beta*y + alpha*A@x, dispatched on plan type (`y=None` drops the
    beta term)."""
    import jax.numpy as jnp

    from .spmv import spmv as _spmv_xla
    if y is None:
        y = jnp.zeros(plan.shape[0], dtype=_plan_dtype(plan))
        beta = 0.0
    if isinstance(plan, DiaPlan):
        return spmv_dia(plan, x, alpha, beta, y)
    if isinstance(plan, RoutedPlan):
        return spmv_routed(plan, x, alpha, beta, y)
    if isinstance(plan, BsrPlan):
        return spmv_bsr(plan, x, alpha, beta, y)
    if isinstance(plan, WcooPlan):
        return spmv_wcoo(plan, x, alpha, beta, y)
    return _spmv_xla(plan, x, alpha, beta, y)


def spmm(plan, B, alpha=1.0, beta=1.0, C=None):
    """C' = beta*C + alpha*A@B, dispatched on plan type (`C=None` drops the
    beta term)."""
    import jax.numpy as jnp

    from .spmm import spmm as _spmm_xla
    if isinstance(plan, RoutedPlan):
        raise TypeError(
            "RoutedPlan is SpMV-only (its contribution routing has no "
            "K-wide analog); build an SpMM plan with make_plan(A) or "
            "make_plan(A, op='spmm')")
    if C is None:
        C = jnp.zeros((plan.shape[0], B.shape[1]), dtype=_plan_dtype(plan))
        beta = 0.0
    if isinstance(plan, DiaPlan):
        return spmm_dia(plan, B, alpha, beta, C)
    if isinstance(plan, BsrPlan):
        import jax
        if (B.shape[1] >= _BSR_PALLAS_MIN_K
                and jax.default_backend() == "tpu"):
            return spmm_bsr_pallas(plan, B, alpha, beta, C)
        return spmm_bsr(plan, B, alpha, beta, C)
    if isinstance(plan, WcooPlan):
        return spmm_wcoo(plan, B, alpha, beta, C)
    return _spmm_xla(plan, B, alpha, beta, C)
