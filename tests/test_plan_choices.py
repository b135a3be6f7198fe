"""Regression-pin make_plan's auto choices per structure class
(VERDICT r4 next#1's CPU-mesh companion to the chip-measured
PLAN_MATRIX.md).

The classes are the plan-matrix experiment's, at full experiment size —
the choice thresholds (routed_min_nnz, blowup limits) are scale-aware,
so shrunken fixtures would pin different branches.  If a heuristic
changes deliberately (e.g. the chip matrix shows auto losing >1.15x on a
class), update the expectation HERE with the measured justification.
"""

import jax.numpy as jnp
import pytest

from experiments.plan_matrix import _kind_of, matrix_classes
from sblas_tpu.ops import make_plan

# Every expectation below is the MEASURED winner from the r5 chip matrix
# (PLAN_MATRIX.md) — auto/best = 1.00x on all twenty cells.
EXPECTED = {
    # class: (spmv kind, spmm kind)
    "shell_fem": ("dia", "bsr"),      # spmm: bsr 0.416 vs dia 0.501 ms
    "web_power": ("routed", "wcoo"),  # power-law web: the spmv headline
    "dense_band": ("bsr", "bsr"),     # spmv: bsr 0.067 vs dia 0.109 ms
    "block_dom": ("bsr", "bsr"),
    "road_local": ("routed", "bsr"),  # spmm: bsr 2.46 vs wcoo 3.62 at
                                      # blowup 347 (MXU >> gathers)
    "uniform": ("routed", "ell"),
    "rect_wide": ("routed", "ell"),
    "near_empty": ("coo", "coo"),     # ell mispick was 111x (fixed
                                      # padded-slot profitability)
    "skew_rows": ("routed", "wcoo"),
    "small_sym": ("dia", "bsr"),      # tiny: dense forms outright
}


@pytest.fixture(scope="module")
def matrices():
    return {name: gen() for name, gen in matrix_classes().items()}


@pytest.mark.parametrize("cname", sorted(EXPECTED))
def test_auto_choice(matrices, cname):
    A = matrices[cname]
    want_v, want_m = EXPECTED[cname]
    assert _kind_of(make_plan(A, dtype=jnp.float32, op="spmv")) == want_v
    assert _kind_of(make_plan(A, dtype=jnp.float32, op="spmm")) == want_m


def test_full_shell_spmm_prefers_dia():
    """The BELL-vs-DIA SpMM crossover is SIZE-dependent (same structure,
    blowup 24): BELL wins at 148 MB padded (0.416 vs 0.501 ms), DIA wins
    at 465 MB (1.462 vs 1.716 ms, chip-verified) — guard the bench
    headline's full-scale choice."""
    import numpy as np

    from sblas_tpu.io.generate import fem_shell_like
    A = fem_shell_like(dtype=np.float32)
    assert _kind_of(make_plan(A, dtype=jnp.float32, op="spmm")) == "dia"
