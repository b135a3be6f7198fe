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
    from sblas_tpu.utils.benchtime import dispatch_overhead_ms, \
        loop_time2_ms, loop_time_ms
    from sblas_tpu.utils.timing import gflops, nnz_per_s, spmm_flops
    from sblas_tpu.utils.verify import assert_equal, check_equal

    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform}), dispatch overhead "
          f"{dispatch_overhead_ms():.2f} ms", file=sys.stderr)

    repeats = {}

    def timed3(name, timer, *t_args, **t_kw):
        """Repeatability contract (VERDICT r4 next#7): every headline is
        three INDEPENDENT timer runs; the median is the canonical number,
        min/spread ride the JSON line so a future ~5% regression is
        distinguishable from capture noise (r4 shipped three same-code
        captures spanning 50.79x/48.61x/48.24x with no way to tell).
        Spread > 5% warns — chip contention happens — but never fails."""
        ts = sorted(timer(*t_args, **t_kw) for _ in range(3))
        spread = (ts[-1] - ts[0]) / max(ts[0], 1e-9)
        if spread > 0.05:
            print(f"# WARN {name}: repeat spread {spread * 100:.1f}% > 5% "
                  f"({', '.join(f'{t:.4f}' for t in ts)} ms) — chip noise "
                  f"or a real instability; median is reported",
                  file=sys.stderr)
        repeats[name] = {"min_ms": round(ts[0], 5),
                         "median_ms": round(ts[1], 5),
                         "spread": round(spread, 4)}
        return ts[1]

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

    # sub-2ms kernels get the two-point estimator: at 32 iters the signal
    # (~20-45 ms) is comparable to the ±5 ms dispatch-constant noise,
    # which spread the r4 headline 0.61-0.71 ms across processes
    ms_base = loop_time_ms(step_base, C0, args=(base_plan,))
    ms_best = timed3("spmm_shell", loop_time2_ms, step_best, C0, iters=64,
                     args=(best_plan,))  # unclamped
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

    def cached_plan(name, build, valid=None):
        """FFTW-wisdom load with a rebuild fallback: a cache file from an
        older plan schema (FormatError) must not kill the bench run, and a
        cache that fails the caller's `valid` predicate (geometry drift
        after a generator/analyzer change) must not silently time the
        wrong plan."""
        path = os.path.join(".bench_cache", name)
        if os.path.exists(path):
            try:
                plan = load_plan(path)
                if valid is None or valid(plan):
                    return plan
                print(f"# plan cache {name} stale (geometry mismatch); "
                      f"rebuilding", file=sys.stderr)
            except Exception as e:  # stale schema / truncated file
                print(f"# plan cache {name} unusable ({e}); rebuilding",
                      file=sys.stderr)
        plan = build()
        os.makedirs(".bench_cache", exist_ok=True)
        save_plan(path, plan)
        return plan

    # v4: heavy-row stack-cap splitting added to the routed plan
    wbest = cached_plan("webbase_spmv_f32_v4.npz",
                        lambda: make_plan(W, dtype=jnp.float32, op="spmv"))
    assert_equal(
        np.asarray(spmv(wbest, xw0, 1.0, 1.0, yw)),
        spmv_cpu(W, DenseVector(np.asarray(xw0)), 1.0, 1.0,
                 DenseVector(np.asarray(yw))), relative=True)

    def wstep_base(y, plan):
        return spmv_coo(plan, xw0 + 1e-6 * y, 1.0, 1.0, y)

    def wstep_best(y, plan):
        return spmv(plan, xw0 + 1e-6 * y, 1.0, 1.0, y)

    ms_wb = loop_time_ms(wstep_base, yw, args=(wbase,))
    ms_wbest = timed3("spmv_webbase", loop_time2_ms, wstep_best, yw,
                      iters=128, args=(wbest,))  # unclamped
    print(f"# spmv webbase-1M-like (nnz={W.nnz}): baseline "
          f"{nnz_per_s(W.nnz, ms_wb):.3e} nnz/s ({ms_wb:.3f} ms), best"
          f"[{type(wbest).__name__}] {nnz_per_s(W.nnz, ms_wbest):.3e} nnz/s "
          f"({ms_wbest:.3f} ms)", file=sys.stderr)

    # informational: opt-in bf16 route transport (documented 2e-3 relative
    # bar — OUTSIDE the reference's 1e-3, so it never feeds the headline;
    # oracle-gated at its own bar before timing)
    if hasattr(wbest, "with_transport"):
        wbest16 = wbest.with_transport("bf16")
        rep16 = check_equal(
            np.asarray(spmv(wbest16, xw0, 1.0, 1.0, yw)),
            spmv_cpu(W, DenseVector(np.asarray(xw0)), 1.0, 1.0,
                     DenseVector(np.asarray(yw))),
            error_bar=2e-3, relative=True)
        if rep16.ok:
            ms_w16 = loop_time2_ms(wstep_best, yw, iters=128,
                                   args=(wbest16,))
            print(f"# spmv webbase bf16 transport (opt-in, 2e-3 bar): "
                  f"{nnz_per_s(W.nnz, ms_w16):.3e} nnz/s ({ms_w16:.3f} ms, "
                  f"{ms_wbest / ms_w16:.2f}x over f32)", file=sys.stderr)
        else:
            print(f"# spmv webbase bf16 transport FAILED its bar: {rep16}",
                  file=sys.stderr)

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

    ms_wm = timed3("spmm_webbase_wcoo", loop_time_ms, wmstep, Cw0,
                   args=(wm_plan,), reps=3)
    print(f"# spmm k64 webbase (unstructured, {type(wm_plan).__name__}): "
          f"{ms_wm:.3f} ms = {gflops(spmm_flops(W.nnz, K), ms_wm):.1f} "
          f"GFLOP/s = {nnz_per_s(W.nnz, ms_wm):.3e} nnz/s", file=sys.stderr)

    # ---- scaling-efficiency projections (BASELINE.md: >=80% linear to
    # v5e-16; one chip attached, so the analytic ICI model projects —
    # see sblas_tpu/scaling.py for the model and its assumptions) ----
    from sblas_tpu.scaling import project_table, report_lines
    table_mm = project_table("spmm", ms_best, A.shape[0], K, 4,
                             halo_rows=2412)
    for line in report_lines("spmm", ms_best, A.shape[0], K, 4,
                             halo_rows=2412, table=table_mm):
        print(line, file=sys.stderr)

    # xfoot (footprint-compressed x-exchange): real plan-time exchange
    # geometry + per-shard compute MEASURED on the chip (the heaviest
    # shard's local plan is exactly what every shard executes inside the
    # shard_map program; t1/n would overstate compute for small shards)
    from sblas_tpu.ops.rspmv import RoutedPlan, spmv_routed
    from sblas_tpu.parallel.xfoot import xfoot_stats, xfoot_worst_local
    xf, shard_ms = {}, {}
    for nsh in (4, 16):
        xf[nsh] = xfoot_stats(W, nsh)
        local, (tg, srs, prs, sks) = xfoot_worst_local(W, nsh)
        lplan = cached_plan(
            f"webbase_xfoot_shard{nsh}_f32_v1.npz",
            lambda: RoutedPlan.from_csr(local, dtype=jnp.float32,
                                        min_gtiles=tg, min_srows=srs,
                                        min_prows=prs, min_sranks=sks),
            # the probe is computed fresh above, so a stale cache (e.g.
            # after a generator or analyzer change) is detectable: the
            # cached plan must match the shard geometry and static sizes
            valid=lambda p: (p.shape == local.shape and p.nnz == local.nnz
                             and p.n_gtiles >= tg and p.n_srows >= srs
                             and p.n_prows >= prs))
        xl = jnp.asarray(
            DenseVector.random(local.shape[1], dtype=np.float32).values)
        yl = jnp.zeros(local.shape[0], jnp.float32)

        def sstep(yc, p, xv):
            return spmv_routed(p, xv + 1e-6 * yc[0], 1.0, 1.0, yc)

        # two-point estimator: at 256 iters the 80 us shard loop is only
        # ~20 ms of signal against ±5 ms dispatch-constant noise (r4
        # decompose measured the same program 54.6 vs 80.5 us across two
        # processes with the one-point form); three repeats because these
        # cells carry meets/MISSES verdicts
        shard_ms[nsh] = timed3(f"xfoot_shard{nsh}", loop_time2_ms, sstep,
                               yl, iters=1024, args=(lplan, xl))
        print(f"# xfoot[spmv] n={nsh}: shard compute "
              f"{shard_ms[nsh] * 1e3:.1f} us (measured), hot "
              f"{xf[nsh].hot_total}, packets {xf[nsh].packet_pad}/pair, "
              f"extract {xf[nsh].extract_mode}", file=sys.stderr)
    table_mv = project_table("spmv", ms_wbest, W.shape[0], 1, 4, xfoot=xf,
                             xfoot_shard_ms=shard_ms)
    for line in report_lines("spmv", ms_wbest, W.shape[0], 1, 4, xfoot=xf,
                             xfoot_shard_ms=shard_ms, table=table_mv):
        print(line, file=sys.stderr)

    # weak scaling (per-chip-constant work): the strong-scaling n=16 cell
    # splits a 3M-nnz problem into 0.19M-nnz shards — below the fixed-
    # cost scale of any plan machinery (per-shard route passes and
    # dispatches do not shrink with the shard).  BASELINE's "at per-chip
    # speed of light" framing is the weak regime: per-chip 1M rows, the
    # single-chip workload itself.  eff_weak = t1(1M matrix) / t_n where
    # t_n = measured worst-shard compute on the 4M matrix at n=4 + the
    # modeled xfoot exchange.
    # the 4M-row proxy generation + full xfoot analysis costs seconds of
    # host time per run; its XFootStats are plan-time constants, so they
    # persist in a JSON sidecar keyed to the plan cache — on a joint hit
    # the W4 matrix is never regenerated (stale pairs are caught by the
    # shape/nnz fingerprint recorded in the sidecar vs the cached plan)
    from sblas_tpu.parallel.xfoot import XFootStats
    st4_path = os.path.join(".bench_cache", "webbase4m_xfoot_stats_v1.json")
    plan4_path = os.path.join(".bench_cache",
                              "webbase4m_xfoot_shard4_f32_v1.npz")
    st4 = lplan4 = None
    if os.path.exists(st4_path) and os.path.exists(plan4_path):
        try:
            with open(st4_path) as fh:
                side = json.load(fh)
            lplan4 = load_plan(plan4_path)
            if (tuple(side["plan_shape"]) == tuple(lplan4.shape)
                    and side["plan_nnz"] == lplan4.nnz):
                st4 = XFootStats(**side["stats"])
            else:
                lplan4 = None
        except Exception as e:
            print(f"# W4 cache unusable ({e}); rebuilding", file=sys.stderr)
            st4 = lplan4 = None
    if st4 is None or lplan4 is None:
        W4 = webbase_like(n=4_000_000, dtype=np.float32)
        st4 = xfoot_stats(W4, 4)

        def _build4():
            local4, (tg, srs, prs, sks) = xfoot_worst_local(W4, 4)
            return RoutedPlan.from_csr(local4, dtype=jnp.float32,
                                       min_gtiles=tg, min_srows=srs,
                                       min_prows=prs, min_sranks=sks)

        lplan4 = cached_plan(os.path.basename(plan4_path), _build4)
        os.makedirs(".bench_cache", exist_ok=True)
        with open(st4_path, "w") as fh:
            json.dump({"stats": st4._asdict(),
                       "plan_shape": list(lplan4.shape),
                       "plan_nnz": int(lplan4.nnz)}, fh)
    xl4 = jnp.asarray(
        DenseVector.random(lplan4.shape[1], dtype=np.float32).values)
    yl4 = jnp.zeros(lplan4.shape[0], jnp.float32)

    def w4step(yc, p, xv):
        return spmv_routed(p, xv + 1e-6 * yc[0], 1.0, 1.0, yc)

    # repeats contract for the weak cell too: a single two-point capture
    # put the 80% verdict at the mercy of ±4% chip noise (78% vs 81%
    # observed across same-code captures)
    ms4 = timed3("spmv_weak_shard4", loop_time2_ms, w4step, yl4,
                 iters=128, args=(lplan4, xl4))
    from sblas_tpu.scaling import ICI_BW_DEFAULT
    comm4_ms = (st4.comm_bytes(4) / ICI_BW_DEFAULT * 1e3
                + st4.extract_ns * 1e-6)
    eff_weak = ms_wbest / (ms4 + comm4_ms)
    print(f"# scaling[spmv] WEAK n=4 (1M rows/chip, 4M-row matrix): "
          f"shard {ms4:.3f} ms + comm {comm4_ms:.3f} ms -> "
          f"{eff_weak * 100:.0f}% of per-chip speed of light "
          f"({'meets' if eff_weak >= 0.8 else 'MISSES'} 80% target)",
          file=sys.stderr)

    # two-tier (slice, chip) projections: the hierarchical mode keeps all
    # but 1/c of the result off the slow DCN tier (parallel/hier.py)
    from sblas_tpu.scaling import project_flat_over_dcn, project_hier
    for op_name, t1, rb in (("spmm", ms_best, A.shape[0] * K * 4),
                            ("spmv", ms_wbest, W.shape[0] * 4)):
        for (s, c) in ((2, 4), (4, 4)):
            h = project_hier(t1, rb, s, c)
            f = project_flat_over_dcn(t1, rb, s, c)
            print(f"# scaling[{op_name}] two-tier {s}x{c}: hier "
                  f"{h.efficiency * 100:.0f}% (comm {h.comm_ms:.3f} ms) "
                  f"vs flat-over-DCN {f.efficiency * 100:.0f}% "
                  f"(comm {f.comm_ms:.3f} ms)", file=sys.stderr)

    # real multi-chip: measure instead of projecting the moment more than
    # one TPU device is attached (scaling.py::measured_multichip; today's
    # rig exposes a single chip, so this stays dormant but tested)
    if len(jax.devices()) > 1 and jax.default_backend() == "tpu":
        from sblas_tpu.scaling import measured_multichip
        chips = [n for n in (2, 4, 8, 16) if n <= len(jax.devices())]
        for op_name, mat, kk, t1 in (("spmm", A, K, ms_best),
                                     ("spmv", W, 1, ms_wbest)):
            for n, ms in measured_multichip(op_name, mat, kk, jnp.float32,
                                            chips):
                eff = t1 / (n * ms) if ms else float("inf")
                print(f"# measured[{op_name}] n={n}: {ms:.3f} ms, "
                      f"efficiency {eff * 100:.0f}%", file=sys.stderr)

    # ---- explicit BASELINE scorecard (VERDICT r3 next#5): the >=80%
    # claim in one auditable block, weak regime stated NEXT TO the red
    # strong cell ----
    from sblas_tpu.scaling import scorecard_lines
    for line in scorecard_lines([
        ("spmm shell K=64", table_mm, None, ""),
        ("spmv webbase-1M", table_mv, (4, eff_weak),
         "weak (1M rows/chip, the single-chip workload itself) is "
         "BASELINE's per-chip speed-of-light regime; the strong n=16 "
         "cell splits 3M nnz into 0.19M-nnz shards, below the plan "
         "machinery's fixed-cost scale"),
    ]):
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
        # repeatability contract (VERDICT r4 next#7): each headline timed
        # as three independent runs; `value` is computed from medians
        "repeats": repeats,
    }))
    return 0


def _device_probe(timeout_s: int = 300) -> bool:
    """Bounded attachment probe in a throwaway subprocess.

    `jax.devices()` hangs INDEFINITELY while the axon attachment is
    wedged (the round-3 outage class); without this gate a driver-run
    bench blocks until the driver's own timeout instead of failing
    fast with a diagnosable message.  The probe subprocess exits (or is
    killed) before main() touches the device, so the no-two-JAX-
    processes rule holds."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
    except subprocess.TimeoutExpired:
        print(f"# bench: device probe timed out after {timeout_s}s — "
              f"attachment wedged; aborting before the unbounded "
              f"jax.devices() hang", file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"# bench: device probe failed rc={r.returncode}: "
              f"{r.stderr.strip()[-500:]}", file=sys.stderr)
        return False
    print(f"# bench: device probe ok ({r.stdout.strip()})",
          file=sys.stderr)
    return True


if __name__ == "__main__":
    if not _device_probe():
        raise SystemExit(1)
    raise SystemExit(main())
