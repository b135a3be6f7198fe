#!/usr/bin/env python3
"""Chip probe: bf16 route transport for the routed SpMV headline.

The main route's layered passes are HBM-bound (~2.2 us/pass at N=262144,
the bulk of the 0.665 ms webbase SpMV).  `routed_transport="bf16"`
narrows the routed contributions to bfloat16 (store-side cast in the
gather kernel, upcast at the lane-stack reduce), halving that traffic IF
the passes are byte-bound — and is a Mosaic compile-check for
take_along_axis on bf16 lanes + bf16 (nb,A,128) transposes, which
interpret mode cannot vouch for.

Transport is an execution-only knob: the cached f32 plan's tables are
reused verbatim via dataclasses.replace, so this costs no plan build.

Run on the real chip, one process, no env overrides:
    python experiments/bf16_transport_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = os.path.join(".bench_cache", "webbase_spmv_f32_v4.npz")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sblas_tpu.containers import DenseVector
    from sblas_tpu.io.generate import webbase_like
    from sblas_tpu.io.plancache import cached_plan
    from sblas_tpu.ops.cpu_reference import spmv_cpu
    from sblas_tpu.ops.rspmv import RoutedPlan, spmv_routed
    from sblas_tpu.utils.benchtime import loop_time_ms
    from sblas_tpu.utils.verify import check_equal

    backend = jax.default_backend()
    print(f"# device {jax.devices()[0]} ({backend})", file=sys.stderr)
    if backend != "tpu":
        print("# WARNING: not on TPU — numbers are not the measurement; "
              "interpret mode cannot vouch for Mosaic bf16 support",
              file=sys.stderr)

    W = webbase_like(dtype=np.float32)
    plan_f32 = cached_plan(
        CACHE, lambda: RoutedPlan.from_csr(W, dtype=jnp.float32),
        valid=lambda p: p.shape == W.shape and p.nnz == W.nnz)

    x = DenseVector.random(W.width, dtype=np.float32)
    y = DenseVector.constant(W.height, 1.0, dtype=np.float32)
    xd = jnp.asarray(x.values)
    yd = jnp.asarray(y.values)
    want = spmv_cpu(W, x, 1.0, 1.0, y)

    results = {}
    for transport, bar in (("f32", 1e-3), ("bf16", 2e-3)):
        plan = plan_f32.with_transport(transport)
        got = spmv_routed(plan, xd, 1.0, 1.0, yd)
        rep = check_equal(np.asarray(got), want, error_bar=bar,
                          relative=True)
        print(f"{transport}: {rep}")
        assert rep.ok, f"{transport} failed its documented bar {bar}"

        def step(yv, p):
            return spmv_routed(p, xd + 1e-6 * yv[:1], 1.0, 1.0, yv)

        ms = loop_time_ms(step, yd, args=(plan,))
        results[transport] = ms
        print(f"{transport}: {ms:.4f} ms = {W.nnz / ms * 1e-6:.3f} Gnnz/s")

    speedup = results["f32"] / results["bf16"]
    print(f"bf16 transport speedup: {speedup:.3f}x "
          f"({results['f32']:.4f} -> {results['bf16']:.4f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
