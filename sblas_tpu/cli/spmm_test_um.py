"""UM-analog SpMM driver — argv contract of the reference's spmm_test_um.

    python -m sblas_tpu.cli.spmm_test_um <method 1|2> <A.mtx> <B_width>
                                         <alpha> <beta> <n_devices>
                                         [tuning 0|1] [f32|f64]

Mirrors spmm_test_um.cu:165-190: same shape as spmm_test plus the trailing
`tuning` flag.  The matrix is host-DRAM-resident (pinned) and streamed into
HBM per band; tuning=1 prefetches it wholly to HBM first (the reference's
cudaMemAdvise/cudaMemPrefetchAsync mode, matrix_um.h:529-564).

The distribution method argument is accepted for argv parity; the
host-resident path is single-chip in this revision (the reference's UM
path is likewise per-GPU residency tuning, not a new distribution).
"""

from __future__ import annotations

import sys

from .common import finish, positional, setup_devices

USAGE = ("usage: python -m sblas_tpu.cli.spmm_test_um "
         "<method 1|2> <A.mtx> <B_width> <alpha> <beta> <n_devices> "
         "[tuning 0|1] [f32|f64]")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    method, path, b_width, alpha, beta, n_dev = positional(
        argv, range(6), (int, str, int, float, float, int), USAGE)
    tuning = bool(int(argv[6])) if len(argv) > 6 else False
    dtype_name = argv[7] if len(argv) > 7 else "f32"

    setup_devices(n_dev)

    import jax.numpy as jnp
    import numpy as np

    from ..containers import CsrMatrix, DenseMatrix, MajorOrder
    from ..memory import host_resident_plan, spmm_um
    from ..ops.cpu_reference import spmm_cpu
    from ..utils.timing import PhaseTimer, gflops, spmm_flops, timed
    from ..utils.verify import check_equal

    np_dtype = np.float64 if dtype_name == "f64" else np.float32
    jnp_dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    times: dict = {}

    with timed("Load time", times):
        A = CsrMatrix.from_mtx(path, dtype=np_dtype)
        B = DenseMatrix.random(A.width, b_width, order=MajorOrder.COL_MAJOR,
                               dtype=np_dtype)
        C = DenseMatrix.constant(A.height, b_width, 1.0, dtype=np_dtype)
    with timed("Distribution time", times):
        hp = host_resident_plan(A, dtype=jnp_dtype)
    print(f"Matrix: {A.height} x {A.width}, nnz {A.nnz}, K={b_width}, "
          f"{hp.n_bands} band(s) x {hp.band_rows} rows [{hp.kind}], "
          f"tuning={int(tuning)}")

    Bd, Cd = jnp.asarray(B.values), jnp.asarray(C.values)
    got = spmm_um(hp, Bd, alpha, beta, Cd, tuning=tuning)  # compile+warm
    timer = PhaseTimer()
    timer.start_timer()
    got = spmm_um(hp, Bd, alpha, beta, Cd, tuning=tuning)
    timer.stop_timer(got)
    times["Run time"] = timer.measure()
    print(f"GFLOPS = {gflops(spmm_flops(A.nnz, b_width), timer.measure()):.3f}")

    with timed("CPU run time", times):
        want = spmm_cpu(A, B, alpha, beta, C)
    report = check_equal(np.asarray(got), want,
                         relative=(np_dtype == np.float32))
    print(report)
    return finish(report.ok, times)


if __name__ == "__main__":
    raise SystemExit(main())
