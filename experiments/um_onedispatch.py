#!/usr/bin/env python3
"""One-dispatch UM streaming probe (follow-up to the r5 UM roofline).

The roofline measured untuned `spmv_um` at 32.6 ms/call against a
12.2 ms device-compute floor and a 4.3 ms DMA floor — dispatch/latency
bound: the executor pays per-chunk dispatches plus separate device_put
transfer ops.  The memories API permits `jax.device_put(host_band,
device_sharding)` INSIDE a jitted program (chip-probed), which hands the
whole band loop — transfers AND compute — to XLA's latency-hiding
scheduler as ONE dispatch.

Variants measured (oracle-gated, two-point over call count):
  A. status-quo `spmv_um` / `spmm_um` untuned;
  B. one-dispatch: all bands as pinned-host jit inputs, in-jit H2D;
  C. chunked in-jit: G bands per dispatch with in-jit H2D (keeps the
     sliding HBM window semantics of the budget).

    python experiments/um_onedispatch.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sblas_tpu.containers import DenseMatrix, DenseVector
    from sblas_tpu.io.generate import fem_shell_like, webbase_like
    from sblas_tpu.memory import host_resident_plan, spmm_um, spmv_um
    from sblas_tpu.memory.host import (_band_matmul, _band_matvec,
                                       _device_sharding, _stream_chunk)
    from sblas_tpu.ops.cpu_reference import spmm_cpu, spmv_cpu
    from sblas_tpu.utils.verify import assert_equal

    sys.path.insert(0, os.path.dirname(__file__))
    from um_roofline import measure_um

    dsh = _device_sharding()

    @partial(jax.jit, static_argnames=("kind", "m"))
    def spmv_one(kind, bands, x, alpha, beta, y, m):
        parts = [_band_matvec(kind, jax.device_put(b, dsh), x)
                 for b in bands]
        return beta * y + alpha * jnp.concatenate(parts)[:m]

    @partial(jax.jit, static_argnames=("kind", "m"))
    def spmm_one(kind, bands, B, alpha, beta, C, m):
        parts = [_band_matmul(kind, jax.device_put(b, dsh), B)
                 for b in bands]
        return beta * C + alpha * jnp.concatenate(parts, axis=0)[:m]

    def spmv_chunked(hp, x, alpha, beta, y, g):
        parts = []
        for c0 in range(0, hp.n_bands, g):
            bands = tuple(hp.bands[i]
                          for i in range(c0, min(c0 + g, hp.n_bands)))
            parts.append(_chunk_one(hp.kind, bands, x))
        return beta * y + alpha * jnp.concatenate(parts)[: hp.shape[0]]

    @partial(jax.jit, static_argnames=("kind",))
    def _chunk_one(kind, bands, x):
        return jnp.concatenate(
            [_band_matvec(kind, jax.device_put(b, dsh), x)
             for b in bands])

    W = webbase_like(dtype=np.float32)
    A = fem_shell_like(dtype=np.float32)
    hpw = host_resident_plan(W, dtype=jnp.float32,
                             hbm_budget_bytes=16 << 20)
    hp = host_resident_plan(A, dtype=jnp.float32,
                            hbm_budget_bytes=32 << 20)
    x = jnp.asarray(DenseVector.random(W.width, dtype=np.float32).values)
    y = jnp.asarray(
        DenseVector.constant(W.height, 1.0, dtype=np.float32).values)
    B = jnp.asarray(DenseMatrix.random(A.width, 64, dtype=np.float32).values)
    C = jnp.asarray(
        DenseMatrix.constant(A.height, 64, 1.0, dtype=np.float32).values)
    print(f"# spmv workload: {hpw.n_bands} bands [{hpw.kind}]; "
          f"spmm: {hp.n_bands} bands [{hp.kind}]; G={_stream_chunk()}",
          file=sys.stderr)

    xv = DenseVector(np.asarray(x))
    yv = DenseVector(np.asarray(y))
    want_v = spmv_cpu(W, xv, 1.0, 1.0, yv)
    got_one = spmv_one(hpw.kind, tuple(hpw.bands), x, 1.0, 1.0, y,
                       hpw.shape[0])
    assert_equal(np.asarray(got_one), want_v, relative=True)
    got_ch = spmv_chunked(hpw, x, 1.0, 1.0, y, _stream_chunk())
    assert_equal(np.asarray(got_ch), want_v, relative=True)
    print("# spmv one-dispatch + chunked: oracle OK", file=sys.stderr)

    ms_a = measure_um("spmv_um status quo", lambda: spmv_um(
        hpw, x, 1.0, 1.0, y, tuning=False))
    ms_b = measure_um("spmv one-dispatch", lambda: spmv_one(
        hpw.kind, tuple(hpw.bands), x, 1.0, 1.0, y, hpw.shape[0]))
    ms_c = measure_um("spmv chunked in-jit", lambda: spmv_chunked(
        hpw, x, 1.0, 1.0, y, _stream_chunk()))
    print(f"# spmv_um: {ms_a:.1f} -> one {ms_b:.1f} ms "
          f"({ms_a / ms_b:.2f}x) / chunked {ms_c:.1f} ms "
          f"({ms_a / ms_c:.2f}x); floors: DMA 4.3, compute 12.2",
          file=sys.stderr)

    Bm = DenseMatrix(np.asarray(B))
    Cm = DenseMatrix(np.asarray(C))
    want_m = spmm_cpu(A, Bm, 1.0, 1.0, Cm)
    got_m = spmm_one(hp.kind, tuple(hp.bands), B, 1.0, 1.0, C, hp.shape[0])
    assert_equal(np.asarray(got_m), want_m, relative=True)
    print("# spmm one-dispatch: oracle OK", file=sys.stderr)
    ms_ma = measure_um("spmm_um status quo", lambda: spmm_um(
        hp, B, 1.0, 1.0, C, tuning=False))
    ms_mb = measure_um("spmm one-dispatch", lambda: spmm_one(
        hp.kind, tuple(hp.bands), B, 1.0, 1.0, C, hp.shape[0]))
    print(f"# spmm_um: {ms_ma:.1f} -> one {ms_mb:.1f} ms "
          f"({ms_ma / ms_mb:.2f}x)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
