"""Scaling-efficiency model (BASELINE.md >=80%-linear north star)."""

import pytest

from sblas_tpu.scaling import (ModeProjection, best_mode, collective_bytes,
                               project, report_lines)


def test_collective_bytes_ring_formulas():
    S = 1000
    assert collective_bytes("mode1", S, 8) == 0.0
    # ring all-reduce moves 2S(n-1)/n per chip, reduce-scatter half that
    assert collective_bytes("mode2_psum", S, 8) == pytest.approx(1750.0)
    assert collective_bytes("mode2_psum_scatter", S, 8) == pytest.approx(875.0)
    assert collective_bytes("halo", S, 8, halo_bytes=64) == 128.0
    assert collective_bytes("mode2_psum", S, 1) == 0.0


def test_projection_monotonicity():
    """More comm -> lower efficiency; mode1 is always linear."""
    t1, S = 1.0, 10_000_000
    p1 = project("mode1", t1, S, 16)
    p2 = project("mode2_psum", t1, S, 16)
    p3 = project("mode2_psum_scatter", t1, S, 16)
    assert p1.efficiency == pytest.approx(1.0)
    assert p3.efficiency > p2.efficiency
    assert best_mode([p1, p2, p3]).mode == "mode1"


def test_efficiency_definition():
    # with zero comm, t_n = t1/n exactly -> efficiency 1
    p = project("mode1", 2.0, 123, 4)
    assert p.t_n_ms == pytest.approx(0.5)
    assert p.efficiency == pytest.approx(1.0)
    # with comm equal to compute, efficiency halves
    t1, n = 1.0, 4
    bw = 1e9
    S = None
    # choose S so comm_ms == t1/n: 2*S*(n-1)/n / bw * 1e3 = 0.25
    S = 0.25 * bw / 1e3 * n / (2 * (n - 1))
    p = project("mode2_psum", t1, S, n, ici_bw=bw)
    assert p.efficiency == pytest.approx(0.5, rel=1e-6)


def test_report_flags_80pct_target():
    # tiny comm: meets target
    lines = report_lines("spmv", 1.0, 1_000_000, 1, 4, chips=(16,))
    assert any("meets 80% target" in ln or "MISSES 80% target" in ln
               for ln in lines)
    # monstrous result bytes: full-C all-reduce must miss at n=16 while
    # mode1 keeps the workload at 100%
    lines = report_lines("spmm", 0.1, 10_000_000, 64, 4, chips=(16,))
    joined = "\n".join(lines)
    assert "mode1 100%" in joined


def test_measured_multichip_smoke():
    """Direct measurement path (used when real multi-chip hardware exists)
    executes on the virtual mesh and returns per-n timings."""
    import jax.numpy as jnp
    import numpy as np

    from sblas_tpu.io.generate import fem_banded_like
    from sblas_tpu.parallel import make_mesh
    from sblas_tpu.scaling import measured_multichip

    A = fem_banded_like(n=600, half_band=5, dtype=np.float64)
    mesh = make_mesh(4)
    rows = measured_multichip("spmv", A, 4, jnp.float64, mesh, chips=(4,))
    assert len(rows) == 1 and rows[0][0] == 4 and rows[0][1] > 0
