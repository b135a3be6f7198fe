#!/usr/bin/env python3
"""Shard-scale stage fusion probe (VERDICT r4 next#3) — the last untried
mechanism on the strong-scaling n=16 red cell.

Mechanism: the main route's FIRST op is always a row-local lane shuffle
(route.py::build_route emits idx1 first), so it can fold into the gather
kernel's store: out[r, :] = take_along_axis(vals*picked, idx1[r, :]).
That removes one full read+write pass over route_n elements AND one
pipeline fill.  The recorded 3.5x fusion penalty (CLAUDE.md: dependent
in-kernel take_along_axis chains stall the pipeline) was measured at
FULL scale where passes are HBM-bound; at 0.19M-nnz shards the r4
decomposition shows passes are pipeline/pass-count-bound (28.5 us on
route spaces quantized to 262144) — the regime where trading stalls for
fewer fills can invert.

Handled regions of the route input [tiles | peel | pad]:
* tile rows: fused in-kernel (this is the experiment);
* peel rows: one small lane_shuffle over the n_prows x 128 block;
* pad rows: zeros — a within-row permutation of a zero row is zero, so
  pass 1 needs no work there.

Done-condition (VERDICT): heaviest n=16 shard <= 60 us, OR a fifth
recorded rejection and the cell formally closes in BASELINE.md.

    python experiments/stage_fuse_probe.py [n_shards=16]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LANES = 128
SLAB = LANES * LANES


def _fused_kernel(gslab_ref, tile_ref, idx_ref, vals_ref, i1_ref, o_ref):
    import jax.numpy as jnp
    del gslab_ref  # consumed by the slab index map (scalar prefetch)
    picked = jnp.take_along_axis(tile_ref[0], idx_ref[0], axis=1)
    contrib = vals_ref[0] * picked
    o_ref[0] = jnp.take_along_axis(contrib, i1_ref[0],
                                   axis=1).astype(o_ref.dtype)


def spmv_routed_fused1(plan, x, alpha, beta, y):
    """spmv_routed with route pass 1 fused into the gather kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from sblas_tpu.ops.route import apply_route
    from sblas_tpu.ops.rspmv import _interpret, _round_up

    m, n = plan.shape
    n_slabs = _round_up(n, SLAB) // SLAB
    if plan.xroute_n:
        xr = apply_route(plan.xroute_schedule,
                         jnp.pad(x, (0, plan.xroute_n - n)),
                         plan.xroute_tables)
        x_slabs = xr[: n_slabs * SLAB].reshape(n_slabs, LANES, LANES)
    else:
        x_slabs = jnp.pad(x, (0, n_slabs * SLAB - n)).reshape(
            n_slabs, LANES, LANES)
    T_g = plan.n_gtiles
    idx1 = plan.tables[0]              # (route_n/128, 128) main pass 1
    R_t = T_g * LANES                  # tile rows in the route view
    i1_tiles = idx1[:R_t].reshape(T_g, LANES, LANES)

    from jax.experimental.pallas import tpu as pltpu
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_g,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda t, gs: (gs[t], 0, 0)),
            pl.BlockSpec((1, LANES, LANES), lambda t, gs: (t, 0, 0)),
            pl.BlockSpec((1, LANES, LANES), lambda t, gs: (t, 0, 0)),
            pl.BlockSpec((1, LANES, LANES), lambda t, gs: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, LANES, LANES), lambda t, gs: (t, 0, 0)),
    )
    tiles1 = pl.pallas_call(
        _fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_g, LANES, LANES), x_slabs.dtype),
        interpret=_interpret(),
    )(plan.gslab, x_slabs, plan.gidx,
      plan.gvals.astype(x_slabs.dtype), i1_tiles)
    parts = [tiles1.reshape(-1)]
    n_pad_rows = 0
    if plan.n_prows:
        from sblas_tpu.ops.route import lane_shuffle
        xp = jnp.take(x, plan.prow_col, axis=0)
        pc = plan.pvals.astype(x.dtype) * xp[:, None]
        # Mosaic requires sublane-divisible blocks: pad the peel rows to
        # a multiple of 8 (pad rows are zeros; their idx rows — real
        # route-pad-region tables or identity — permute zeros to zeros)
        R8 = -(-plan.n_prows // 8) * 8
        pc = jnp.pad(pc, ((0, R8 - plan.n_prows), (0, 0)))
        avail = idx1.shape[0] - R_t
        take = min(R8, avail)
        idxp = idx1[R_t:R_t + take]
        if take < R8:
            idxp = jnp.concatenate([
                idxp, jnp.broadcast_to(
                    jnp.arange(LANES, dtype=idx1.dtype),
                    (R8 - take, LANES))])
        parts.append(lane_shuffle(pc, idxp).reshape(-1))
        n_pad_rows = R8 - plan.n_prows
    contrib1 = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    # pad rows: zero rows permute to zero rows — pass 1 is a no-op there
    del n_pad_rows  # (absorbed into the route_n zero pad below)
    contrib1 = jnp.pad(contrib1, (0, plan.route_n - contrib1.shape[0]))
    routed = apply_route(plan.schedule[1:], contrib1, plan.tables[1:])
    stack = routed[: plan.n_srows * LANES].reshape(
        plan.n_srows, LANES).astype(x.dtype)
    blocks = jax.ops.segment_sum(stack, plan.brow_ids,
                                 num_segments=plan.n_blocks,
                                 indices_are_sorted=True)
    y_srank = blocks.reshape(-1)
    y_rank = y_srank[: plan.n_rank_pad]
    if plan.merged:
        y_rank = y_rank.at[plan.merge_ids].add(y_srank[plan.n_rank_pad:])
    y_rank = jnp.pad(y_rank, (0, plan.unrank_n - y_rank.shape[0]))
    ax = apply_route(plan.unrank_schedule, y_rank, plan.unrank_tables)[:m]
    return beta * y + alpha * ax


def main() -> int:
    import jax
    import jax.numpy as jnp

    from sblas_tpu.containers import DenseVector
    from sblas_tpu.io.generate import webbase_like
    from sblas_tpu.io.plancache import cached_plan
    from sblas_tpu.ops.rspmv import RoutedPlan, spmv_routed
    from sblas_tpu.parallel.xfoot import xfoot_worst_local
    from sblas_tpu.utils.benchtime import loop_time2_ms
    from sblas_tpu.utils.verify import check_equal

    args = [a for a in sys.argv[1:] if a != "--check-only"]
    check_only = "--check-only" in sys.argv
    n_shards = int(args[0]) if args else 16
    W = webbase_like(n=1_000_000, dtype=np.float32)
    local, (tg, srs, prs, sks) = xfoot_worst_local(W, n_shards)
    plan = cached_plan(
        f".bench_cache/webbase_xfoot_shard{n_shards}_f32_v1.npz",
        lambda: RoutedPlan.from_csr(local, dtype=jnp.float32,
                                    min_gtiles=tg, min_srows=srs,
                                    min_prows=prs, min_sranks=sks),
        valid=lambda p: (p.shape == local.shape and p.nnz == local.nnz
                         and p.n_gtiles >= tg and p.n_srows >= srs
                         and p.n_prows >= prs))
    sched0 = plan.schedule[0]
    print(f"# shard: {local.shape} nnz={local.nnz}, route_n="
          f"{plan.route_n}, schedule[0]={sched0}, "
          f"{len(plan.schedule)} main ops", file=sys.stderr)
    assert sched0[0] == "gather", "pass-1 fusion requires a gather first"

    x = jnp.asarray(
        DenseVector.random(local.shape[1], dtype=np.float32).values)
    y0 = jnp.zeros(local.shape[0], jnp.float32)

    # exactness gate: the fused pipeline must reproduce the stock one
    want = np.asarray(spmv_routed(plan, x, 1.0, 0.0, y0))
    got = np.asarray(spmv_routed_fused1(plan, x, 1.0, 0.0, y0))
    rep = check_equal(got, want, error_bar=0.0)
    print(f"# fused-vs-stock exactness: {rep}", file=sys.stderr)
    if not rep.ok:
        print("# ABORT: fused pipeline differs", file=sys.stderr)
        return 1
    if check_only:
        return 0

    def stock(yc, p, xv):
        return spmv_routed(p, xv + 1e-6 * yc[0], 1.0, 1.0, yc)

    def fused(yc, p, xv):
        return spmv_routed_fused1(p, xv + 1e-6 * yc[0], 1.0, 1.0, yc)

    ms_stock = loop_time2_ms(stock, y0, iters=1024, args=(plan, x))
    ms_fused = loop_time2_ms(fused, y0, iters=1024, args=(plan, x))
    print(f"# n={n_shards} heaviest shard: stock {ms_stock * 1e3:.1f} us, "
          f"fused(gather+route-pass-1) {ms_fused * 1e3:.1f} us "
          f"({ms_stock / ms_fused:.3f}x)", file=sys.stderr)
    verdict = ("MEETS <=60us" if ms_fused * 1e3 <= 60.0 else
               "still above 60us")
    print(f"# verdict: {verdict}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
