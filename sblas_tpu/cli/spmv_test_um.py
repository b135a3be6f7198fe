"""UM-analog SpMV driver — argv contract of the reference's spmv_test_um.

    python -m sblas_tpu.cli.spmv_test_um <A.mtx> <alpha> <beta> <n_devices>
                                         [tuning 0|1] [f32|f64]

Mirrors spmv_test_um.cu: the spmv_test shape plus the trailing tuning flag
(host-DRAM-resident A, band-streamed; tuning=1 prefetches to HBM).
"""

from __future__ import annotations

import sys

from .common import finish, positional, setup_devices

USAGE = ("usage: python -m sblas_tpu.cli.spmv_test_um "
         "<A.mtx> <alpha> <beta> <n_devices> [tuning 0|1] [f32|f64]")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    path, alpha, beta, n_dev = positional(
        argv, range(4), (str, float, float, int), USAGE)
    tuning = bool(int(argv[4])) if len(argv) > 4 else False
    dtype_name = argv[5] if len(argv) > 5 else "f32"

    setup_devices(n_dev)

    import jax.numpy as jnp
    import numpy as np

    from ..containers import CsrMatrix, DenseVector
    from ..memory import host_resident_plan, spmv_um
    from ..ops.cpu_reference import spmv_cpu
    from ..utils.timing import PhaseTimer, nnz_per_s, timed
    from ..utils.verify import check_equal

    np_dtype = np.float64 if dtype_name == "f64" else np.float32
    jnp_dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    times: dict = {}

    with timed("Load time", times):
        A = CsrMatrix.from_mtx(path, dtype=np_dtype)
        x = DenseVector.random(A.width, dtype=np_dtype)
        y = DenseVector.constant(A.height, 1.0, dtype=np_dtype)
    with timed("Distribution time", times):
        hp = host_resident_plan(A, dtype=jnp_dtype)
    print(f"Matrix: {A.height} x {A.width}, nnz {A.nnz}, "
          f"{hp.n_bands} band(s) x {hp.band_rows} rows [{hp.kind}], "
          f"tuning={int(tuning)}")

    xd, yd = jnp.asarray(x.values), jnp.asarray(y.values)
    got = spmv_um(hp, xd, alpha, beta, yd, tuning=tuning)  # compile+warm
    timer = PhaseTimer()
    timer.start_timer()
    got = spmv_um(hp, xd, alpha, beta, yd, tuning=tuning)
    timer.stop_timer(got)
    times["Run time"] = timer.measure()
    print(f"nnz/s = {nnz_per_s(A.nnz, timer.measure()):.3e}")

    with timed("CPU run time", times):
        want = spmv_cpu(A, x, alpha, beta, y)
    report = check_equal(np.asarray(got), want,
                         relative=(np_dtype == np.float32))
    print(report)
    return finish(report.ok, times)


if __name__ == "__main__":
    raise SystemExit(main())
