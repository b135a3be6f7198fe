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

EXPECTED = {
    # class: (spmv kind, spmm kind)
    "shell_fem": ("dia", "dia"),      # banded FEM: the r2+ bench headline
    "web_power": ("routed", "wcoo"),  # power-law web: the other headline
    "dense_band": ("dia", "bsr"),
    "block_dom": ("bsr", "bsr"),
    "road_local": ("routed", "ell"),
    "uniform": ("routed", "ell"),
    "rect_wide": ("routed", "ell"),
    "near_empty": ("ell", "ell"),     # suspect (m >> nnz): chip matrix
                                      # will arbitrate ell vs coo here
    "skew_rows": ("routed", "wcoo"),
    "small_sym": ("ell", "ell"),
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
