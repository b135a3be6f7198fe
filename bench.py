#!/usr/bin/env python3
"""Headline benchmark.  Prints ONE JSON line on stdout:

    {"metric": "ref_workloads_geomean_speedup", "value": N, "unit": "x",
     "vs_baseline": N}

Covers BOTH of the reference's benchmark workloads (profiling.sh:6-21):
CSR SpMM K=64 on the s3dkq4m2-structure proxy (n=90449 banded FEM, ~6.6M
nnz) and CSR SpMV on the webbase-1M proxy (1M rows, power-law, ~3.1M nnz)
— synthesized because the environment has no network egress.  `value` is
the geometric mean of the two speedups of the best planned path over the
framework's Tier-0 path (plain COO gather + segment_sum under jit — the
faithful translation of what the reference delegates to cuSPARSE), since
the reference publishes no absolute numbers (BASELINE.md).  Absolute
GFLOP/s / nnz/s per workload go to stderr.

Timing runs K iterations inside one jitted fori_loop with the carry
threaded through the op inputs (see sblas_tpu/utils/benchtime.py — the
dispatch tunnel makes naive block_until_ready timing meaningless).

Secondary metrics (SpMV on the webbase-1M proxy, roofline fractions) go to
stderr.  Results are correctness-checked against the CPU oracle before any
number is reported.
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
    from sblas_tpu.io.generate import fem_banded_like, webbase_like
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

    # ---- headline: SpMM K=64 on s3dkq4m2-like ----
    K = 64
    A = fem_banded_like(dtype=np.float32)  # n=90449, band 73, ~6.6M nnz
    B = jnp.asarray(DenseMatrix.random(A.width, K, dtype=np.float32).values)
    C0 = jnp.asarray(
        DenseMatrix.constant(A.height, K, 1.0, dtype=np.float32).values)
    Bc = B[: A.height]  # carry-coupling slice (square here: full B)

    base_plan = CooPlan.from_csr(A, dtype=jnp.float32)
    best_plan = make_plan(A, dtype=jnp.float32)

    # correctness gate before timing
    want = spmm_cpu(A, DenseMatrix(np.asarray(B)), 1.0, 1.0,
                    DenseMatrix(np.asarray(C0)))
    assert_equal(np.asarray(spmm(best_plan, B, 1.0, 1.0, C0)), want,
                 relative=True)

    def step_base(C):
        return spmm_coo(base_plan, B + 0.0 * Bc * C[:1].mean(), 1.0, 1.0, C)

    def step_best(C):
        return spmm(best_plan, B + 0.0 * Bc * C[:1].mean(), 1.0, 1.0, C)

    ms_base = loop_time_ms(step_base, C0)
    ms_best = loop_time_ms(step_best, C0)  # unclamped: report measured reality
    flops = spmm_flops(A.nnz, K)
    g_best = gflops(flops, ms_best)
    print(f"# spmm k64 (n={A.shape[0]}, nnz={A.nnz}): "
          f"baseline {gflops(flops, ms_base):.1f} GFLOP/s ({ms_base:.3f} ms),"
          f" best[{type(best_plan).__name__}] {g_best:.1f} GFLOP/s "
          f"({ms_best:.3f} ms)", file=sys.stderr)

    # ---- secondary: SpMV on webbase-1M-like ----
    W = webbase_like(dtype=np.float32)
    xw0 = jnp.asarray(DenseVector.random(W.width, dtype=np.float32).values)
    yw = jnp.asarray(
        DenseVector.constant(W.height, 1.0, dtype=np.float32).values)
    wbase = CooPlan.from_csr(W, dtype=jnp.float32)
    # plan cache: the routed plan's analysis (edge coloring over ~nnz
    # edges) costs ~18 s on this host; persist it like FFTW wisdom
    from sblas_tpu.io.plancache import load_plan, save_plan
    cache = os.path.join(".bench_cache", "webbase_spmv_f32.npz")
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

    def wstep_base(y):
        return spmv_coo(wbase, xw0 + 0.0 * y, 1.0, 1.0, yw)

    def wstep_best(y):
        return spmv(wbest, xw0 + 0.0 * y, 1.0, 1.0, yw)

    ms_wb = loop_time_ms(wstep_base, yw)
    ms_wbest = loop_time_ms(wstep_best, yw)  # unclamped
    print(f"# spmv webbase-1M-like (nnz={W.nnz}): baseline "
          f"{nnz_per_s(W.nnz, ms_wb):.3e} nnz/s ({ms_wb:.3f} ms), best"
          f"[{type(wbest).__name__}] {nnz_per_s(W.nnz, ms_wbest):.3e} nnz/s "
          f"({ms_wbest:.3f} ms)", file=sys.stderr)

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
