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

# SpMM-side BELL acceptance (PLAN_MATRIX.md, chip-measured r5): dense
# 128x128 blocks run on the MXU at multi-TF/s while every gather layout
# is bound by ~6-7 ns/row B fetches, so BELL wins SpMM even at large
# fill blowup — road-class (blowup 347, 684 MB padded) measured 2.46 ms
# vs wcoo 3.62 / ell 10.1.  The caps exclude the measured losers:
# near-empty (blowup 89617: HBM-bound on padding, 9.5 ms vs coo 1.6)
# and the 10-30 GB uniform/skew/web paddings.  512 sits between the
# measured win at 347 and the measured loss at 9437.
_BSR_SPMM_BLOWUP_LIMIT = 512.0
_BSR_SPMM_BYTES_CAP = 1 << 30

# SpMM-side BELL-vs-DIA crossover when BOTH are profitable (same shell
# structure, bsr blowup 24, measured at two sizes): BELL is HBM-bound on
# padded bytes (0.416 ms @ 148 MB, 1.716 ms @ 465 MB ~ 300-360 GB/s),
# DIA SpMM is VPU-bound on ndiags*m*K FMAs (0.501 / 1.462 ms — the
# pass model predicts 0.50 / 1.50 at 0.35 TF/s) — so big padded BELL
# loses to lean DIA while small padded BELL wins.  256 MB sits between
# the measured win at 148 MB and the measured loss at 465 MB.
_BSR_DIA_SPMM_BYTES = 256 << 20

# SpMV-side BELL-vs-DIA crossover (PLAN_MATRIX.md): DIA SpMV is
# pass-count-bound (one sliced FMA per diagonal), BELL SpMV is HBM-bound
# on padded bytes — at low blowup BELL wins (dense band-73: bsr 0.067 ms
# vs dia 0.109), at high blowup DIA wins (shell, bsr blowup 24: dia
# 0.139 vs bsr 0.219).  8 sits between the measured 5.3 and 24.1.
_BSR_SPMV_BLOWUP = 8.0

# B width at which the Pallas scalar-prefetch BELL kernel overtakes the XLA
# formulation: the XLA path materializes a gathered B copy per slot
# (traffic grows with K), the Pallas path streams (C, K) tiles straight to
# VMEM.  Measured crossover on v5e: K=64 XLA 2100 GF/s vs Pallas 960;
# K=256 XLA 1620 vs Pallas 1918.
_BSR_PALLAS_MIN_K = 256


def make_plan(A, dtype=None, config=DEFAULT, force=None, op=None):
    """Choose the best single-chip layout for CSR matrix `A`.

    Heuristics chip-calibrated across ten structure classes x every
    feasible layout (PLAN_MATRIX.md, experiments/plan_matrix.py — the
    role cuSPARSE's format-agnostic dispatch plays in the reference,
    spmm.h:146-149).  SpMV ladder: DIA (shift-and-FMA) when banded —
    except low-blowup BELL, which beats DIA's per-diagonal passes; the
    routed gather/route/stack engine for large unstructured matrices;
    then BELL / ELL / windowed-COO / COO.  SpMM / mixed ladder: BELL
    (MXU batched matmuls) whenever its padding fits the measured caps —
    dense blocks on the MXU outrun every gather layout even at blowup
    ~350 — then DIA, ELL, windowed-COO, plain COO as the universal
    fallback.  Tiny (one-block) matrices go dense outright.  `force` in
    {"dia", "routed", "bsr", "ell", "wcoo", "coo"} overrides; `op` in
    {None, "spmv", "spmm"} biases the choice toward that kernel (routed
    is SpMV-only and never auto-chosen for mixed use)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    kind = force
    if kind is None:
        m, n = A.shape
        bst = bell_stats(A, config.bsr_block)
        bsr_bytes = bst["blowup"] * max(A.nnz, 1) * jnp.dtype(dtype).itemsize
        if m <= config.bsr_block[0] and n <= config.bsr_block[1]:
            # tiny matrix (one MXU block / one lane tile): the dense
            # forms win outright — blowup ratios are meaningless at
            # kilobyte scale (PLAN_MATRIX.md small_sym row)
            kind = "dia" if op == "spmv" else "bsr"
        elif op == "spmv":
            if DiaPlan.is_profitable(A, config):
                # low-blowup BELL beats DIA's per-diagonal passes
                # (chip-measured crossover, see _BSR_SPMV_BLOWUP)
                kind = ("bsr" if bst["blowup"] <= _BSR_SPMV_BLOWUP
                        else "dia")
            elif (RoutedPlan.is_profitable(A, config)
                  and bst["blowup"] > config.bsr_blowup_limit):
                kind = "routed"
            elif bst["blowup"] <= config.bsr_blowup_limit:
                kind = "bsr"
            elif EllPlan.is_profitable(A, config):
                kind = "ell"
        else:  # spmm / mixed use
            if (bst["blowup"] <= _BSR_SPMM_BLOWUP_LIMIT
                    and bsr_bytes <= _BSR_SPMM_BYTES_CAP):
                # large padded BELL goes HBM-bound; a lean DIA form (when
                # one exists) stays VPU-bound and overtakes it (see
                # _BSR_DIA_SPMM_BYTES — chip-measured at two shell sizes)
                kind = ("dia" if (bsr_bytes > _BSR_DIA_SPMM_BYTES
                                  and DiaPlan.is_profitable(A, config))
                        else "bsr")
            elif DiaPlan.is_profitable(A, config):
                kind = "dia"
            elif EllPlan.is_profitable(A, config):
                kind = "ell"
        if kind is None:
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
