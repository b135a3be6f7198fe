#!/usr/bin/env python3
"""Headline benchmark.  Prints ONE JSON line on stdout:

    {"metric": "ref_workloads_geomean_speedup", "value": N, "unit": "x",
     "vs_baseline": N}

Covers BOTH of the reference's benchmark workloads (profiling.sh:6-21):
CSR SpMM K=64 on the s3dkq4m2-structure proxy (`fem_shell_like`: FEM
cylindrical-shell mesh, n=90449, ~4.8M nnz, ~2.4k bandwidth with sparse
stripes — the real matrix's aggregate stats) and CSR SpMV on the
webbase-1M proxy (`webbase_like`: 1M rows, power-law out-degree, column
locality + Zipf in-degree hubs) — synthesized because the environment has
no network egress.  `value` is the geometric mean of the two speedups of
the best planned path over the framework's Tier-0 path (plain COO gather +
segment_sum under jit — the faithful translation of what the reference
delegates to cuSPARSE), since the reference publishes no absolute numbers
(BASELINE.md).  Speedups are UNCLAMPED — a plan losing to tier-0 would
report < 1x.  Absolute GFLOP/s / nnz/s per workload go to stderr, plus a
secondary unstructured-SpMM figure (webbase x K=64).

Timing runs K iterations inside one jitted fori_loop with the carry
threaded through the op inputs (see sblas_tpu/utils/benchtime.py — the
dispatch tunnel makes naive block_until_ready timing meaningless).  Plans
are passed as loop ARGUMENTS, not closure captures: captured arrays embed
as HLO constants and overflow the remote-compile tunnel (HTTP 413).

Results are correctness-checked against the CPU oracle before any number
is reported.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sblas_tpu.containers import DenseMatrix, DenseVector
    from sblas_tpu.io.generate import fem_shell_like, webbase_like
    from sblas_tpu.ops import make_plan, spmm, spmv
    from sblas_tpu.ops.cpu_reference import spmm_cpu, spmv_cpu
    from sblas_tpu.ops.plans import CooPlan
    from sblas_tpu.ops.spmm import spmm_coo
    from sblas_tpu.ops.spmv import spmv_coo
    from sblas_tpu.utils.benchtime import dispatch_overhead_ms, loop_time_ms
    from sblas_tpu.utils.timing import gflops, nnz_per_s, spmm_flops
    from sblas_tpu.utils.verify import assert_equal

    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform}), dispatch overhead "
          f"{dispatch_overhead_ms():.2f} ms", file=sys.stderr)

    # ---- headline 1: SpMM K=64 on the s3dkq4m2 shell proxy ----
    K = 64
    A = fem_shell_like(dtype=np.float32)  # n=90449, ~4.8M nnz, ~2.4k band
    B = jnp.asarray(DenseMatrix.random(A.width, K, dtype=np.float32).values)
    C0 = jnp.asarray(
        DenseMatrix.constant(A.height, K, 1.0, dtype=np.float32).values)

    base_plan = CooPlan.from_csr(A, dtype=jnp.float32)
    best_plan = make_plan(A, dtype=jnp.float32, op="spmm")

    # correctness gate before timing
    want = spmm_cpu(A, DenseMatrix(np.asarray(B)), 1.0, 1.0,
                    DenseMatrix(np.asarray(C0)))
    assert_equal(np.asarray(spmm(best_plan, B, 1.0, 1.0, C0)), want,
                 relative=True)

    # coupling rules (measured, see CLAUDE.md): the carry MUST be the
    # accumulate operand (C), and the primary-operand eps must be NONZERO —
    # 0.0*carry folds away and lets XLA hoist loop-invariant stages (the
    # routed x-permute hoisted under a 0.0 coupling: 0.61 vs the honest
    # 0.72 ms); an eps with a FIXED accumulate operand overstates ~2x
    # (3.36 vs the f^k ground truth 1.59 ms on DIA SpMM)
    def step_base(C, plan):
        return spmm_coo(plan, B + 1e-6 * C[:1].mean(), 1.0, 1.0, C)

    def step_best(C, plan):
        return spmm(plan, B + 1e-6 * C[:1].mean(), 1.0, 1.0, C)

    ms_base = loop_time_ms(step_base, C0, args=(base_plan,))
    ms_best = loop_time_ms(step_best, C0, args=(best_plan,))  # unclamped
    flops = spmm_flops(A.nnz, K)
    g_best = gflops(flops, ms_best)
    print(f"# spmm k64 shell (n={A.shape[0]}, nnz={A.nnz}): "
          f"baseline {gflops(flops, ms_base):.1f} GFLOP/s ({ms_base:.3f} ms),"
          f" best[{type(best_plan).__name__}] {g_best:.1f} GFLOP/s "
          f"({ms_best:.3f} ms)", file=sys.stderr)

    # ---- headline 2: SpMV on webbase-1M-like (locality + in-degree skew) --
    W = webbase_like(dtype=np.float32)
    xw0 = jnp.asarray(DenseVector.random(W.width, dtype=np.float32).values)
    yw = jnp.asarray(
        DenseVector.constant(W.height, 1.0, dtype=np.float32).values)
    wbase = CooPlan.from_csr(W, dtype=jnp.float32)
    # plan cache: the routed plan's analysis (edge coloring over ~nnz
    # edges) costs ~15 s on this host; persist it like FFTW wisdom.
    # v2: skewed proxy + hub peeling (cache is keyed by file name).
    from sblas_tpu.io.plancache import load_plan, save_plan
    cache = os.path.join(".bench_cache", "webbase_spmv_f32_v3.npz")
    if os.path.exists(cache):
        wbest = load_plan(cache)
    else:
        wbest = make_plan(W, dtype=jnp.float32, op="spmv")
        os.makedirs(".bench_cache", exist_ok=True)
        save_plan(cache, wbest)
    assert_equal(
        np.asarray(spmv(wbest, xw0, 1.0, 1.0, yw)),
        spmv_cpu(W, DenseVector(np.asarray(xw0)), 1.0, 1.0,
                 DenseVector(np.asarray(yw))), relative=True)

    def wstep_base(y, plan):
        return spmv_coo(plan, xw0 + 1e-6 * y, 1.0, 1.0, y)

    def wstep_best(y, plan):
        return spmv(plan, xw0 + 1e-6 * y, 1.0, 1.0, y)

    ms_wb = loop_time_ms(wstep_base, yw, args=(wbase,))
    ms_wbest = loop_time_ms(wstep_best, yw, args=(wbest,))  # unclamped
    print(f"# spmv webbase-1M-like (nnz={W.nnz}): baseline "
          f"{nnz_per_s(W.nnz, ms_wb):.3e} nnz/s ({ms_wb:.3f} ms), best"
          f"[{type(wbest).__name__}] {nnz_per_s(W.nnz, ms_wbest):.3e} nnz/s "
          f"({ms_wbest:.3f} ms)", file=sys.stderr)

    # ---- secondary: unstructured SpMM K=64 on the webbase proxy ----
    # (not a reference workload — s3dkq4m2 is the SpMM benchmark — but the
    # SpMM story must cover both structure classes; VERDICT r1 next#8)
    Bw = jnp.asarray(DenseMatrix.random(W.width, K, dtype=np.float32).values)
    Cw0 = jnp.asarray(
        DenseMatrix.constant(W.height, K, 1.0, dtype=np.float32).values)
    wm_plan = make_plan(W, dtype=jnp.float32, op="spmm")
    assert_equal(
        np.asarray(spmm(wm_plan, Bw, 1.0, 1.0, Cw0)),
        spmm_cpu(W, DenseMatrix(np.asarray(Bw)), 1.0, 1.0,
                 DenseMatrix(np.asarray(Cw0))), relative=True)

    def wmstep(C, plan):
        return spmm(plan, Bw + 1e-6 * C[:1].mean(), 1.0, 1.0, C)

    ms_wm = loop_time_ms(wmstep, Cw0, args=(wm_plan,), reps=3)
    print(f"# spmm k64 webbase (unstructured, {type(wm_plan).__name__}): "
          f"{ms_wm:.3f} ms = {gflops(spmm_flops(W.nnz, K), ms_wm):.1f} "
          f"GFLOP/s = {nnz_per_s(W.nnz, ms_wm):.3e} nnz/s", file=sys.stderr)

    # ---- scaling-efficiency projections (BASELINE.md: >=80% linear to
    # v5e-16; one chip attached, so the analytic ICI model projects —
    # see sblas_tpu/scaling.py for the model and its assumptions) ----
    from sblas_tpu.scaling import report_lines
    for line in report_lines("spmm", ms_best, A.shape[0], K, 4,
                             halo_rows=2412):
        print(line, file=sys.stderr)
    for line in report_lines("spmv", ms_wbest, W.shape[0], 1, 4):
        print(line, file=sys.stderr)

    geomean = float(np.sqrt((ms_base / ms_best) * (ms_wb / ms_wbest)))
    print(f"# spmm speedup {ms_base/ms_best:.1f}x, spmv speedup "
          f"{ms_wb/ms_wbest:.1f}x, spmm {g_best:.1f} GFLOP/s, spmv "
          f"{nnz_per_s(W.nnz, ms_wbest):.3e} nnz/s", file=sys.stderr)
    print(json.dumps({
        "metric": "ref_workloads_geomean_speedup",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
