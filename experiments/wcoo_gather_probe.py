#!/usr/bin/env python3
"""VERDICT r3 next#3: the missing wcoo B-row gather experiment.

Question: can the framework's slab-bucket Pallas gather (ops/rspmv.py
stage 1: VMEM-resident window + `take_along_axis` along lanes) replace
the XLA flat B-row gather that dominates webbase SpMM (22 of 34.1 ms at
6.2 ns/row)?

Three parts, two host-side and one on-chip:

1. HOST: reduce-tile fill when wcoo tiles are restricted to column
   slabs (the fused gather+reduce variant).  Measured on the webbase
   proxy: fill 1.10 -> 21.8 at 16k-col slabs (19.9x tiles -> ~19.9x
   MXU reduce work), 8.9 at 64k, 2.9 at 256k.  The reduce side alone
   kills the fused form.
2. HOST arithmetic: the UNFUSED form (Pallas gather in column order,
   then bridge to row order for the reduce) needs a 64-wide row
   permutation as the bridge — the SAME op shape as the gather it
   replaces (6.2 ns/row, r3-measured, locality-insensitive), or a
   per-k scalar route at 0.09 ns/elem x route_n(>=4.2M) x 64 k ~ 24 ms.
   Either bridge costs >= the replaced gather even if the Pallas
   gather itself were free.
3. CHIP (this script): time the Pallas column-window lane-gather of
   64-wide rows anyway, completing the measured record — and time the
   status-quo XLA gather in the same harness for a like-for-like
   number.

Run on the real TPU, fresh process, no env overrides:
    python experiments/wcoo_gather_probe.py
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 64
LANES = 128


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sblas_tpu.io.generate import webbase_like
    from sblas_tpu.ops.wcoo import TILE, wcoo_tile_count
    from sblas_tpu.utils.benchtime import dispatch_overhead_ms, loop_time_ms

    print(f"# device {jax.devices()[0]}, dispatch "
          f"{dispatch_overhead_ms():.2f} ms", file=sys.stderr)
    W = webbase_like(dtype=np.float32)
    coo = W.to_coo()
    nnz = W.nnz
    n = W.shape[1]
    n_pad = ((n + LANES - 1) // LANES) * LANES
    nb = n_pad // LANES

    # ---- part 1 recap (host): reduce fill under column slabs ----
    base_tiles = wcoo_tile_count(W)
    print(f"reduce fill status quo: {base_tiles} tiles "
          f"({base_tiles * TILE / nnz:.2f})")
    for slab_cols in (16384, 65536, 262144):
        total = 0
        for c0 in range(0, n, slab_cols):
            sel = (coo.col_idx >= c0) & (coo.col_idx < c0 + slab_cols)
            rows = coo.row_idx[sel]
            if not len(rows):
                continue
            anchors = ((rows >> 7) + 2) * 128
            limit = np.searchsorted(rows, anchors, side="left")
            i = cnt = 0
            while i < len(rows):
                cnt += 1
                i = min(i + TILE, int(limit[i]))
            total += cnt
        print(f"reduce fill @ col-slab {slab_cols}: {total} tiles "
              f"({total * TILE / nnz:.2f}, {total / base_tiles:.1f}x)")

    # ---- column-window gather layout (host) ----
    cols = np.sort(coo.col_idx.astype(np.int32))
    win = cols >> 7                       # 128-row B window per entry
    lane = (cols & 127).astype(np.int32)
    # tiles of 128 entries, each within one window
    uniq, counts = np.unique(win, return_counts=True)
    tiles_per_win = -(-counts // LANES)
    T = int(tiles_per_win.sum())
    print(f"gather tiles: {T} (fill {T * LANES / nnz:.2f}) over "
          f"{len(uniq)} windows")
    wblk = np.repeat(uniq, tiles_per_win).astype(np.int32)
    lane_tiles = np.zeros((T, 1, LANES), dtype=np.int32)
    pos = 0
    t0 = 0
    for u, c, tw in zip(uniq, counts, tiles_per_win):
        seg = lane[pos:pos + c]
        buf = np.zeros(tw * LANES, np.int32)
        buf[:c] = seg
        lane_tiles[t0:t0 + tw, 0, :] = buf.reshape(tw, LANES)
        pos += c
        t0 += tw

    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.normal(size=(n_pad, K)).astype(np.float32))
    Bt = jnp.swapaxes(B.reshape(nb, LANES, K), 1, 2)  # (nb, K, 128), free
    wblk_d = jnp.asarray(wblk)
    lane_d = jnp.asarray(lane_tiles)

    def kern(wblk_ref, bt_ref, idx_ref, out_ref):
        del wblk_ref
        idx = jnp.broadcast_to(idx_ref[0], (K, LANES))
        out_ref[0] = jnp.take_along_axis(bt_ref[0], idx, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, LANES), lambda t, wb: (wb[t], 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda t, wb: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, LANES), lambda t, wb: (t, 0, 0)),
    )

    @jax.jit
    def pallas_gather(bt, wb, idx):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, K, LANES), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(wb, bt, idx)

    # correctness gate vs numpy before timing (first 4096 entries)
    out = np.asarray(pallas_gather(Bt, wblk_d, lane_d))
    picked = out.transpose(0, 2, 1).reshape(T * LANES, K)
    # entry e of tile t sits at slot t*128+pos; rebuild the slot of each
    # real entry
    slot = np.zeros(nnz, np.int64)
    pos = 0
    t0 = 0
    for u, c, tw in zip(uniq, counts, tiles_per_win):
        slot[pos:pos + c] = t0 * LANES + np.arange(c)
        pos += c
        t0 += tw
    want = np.asarray(B)[cols[:4096]]
    got = picked[slot[:4096]]
    assert np.array_equal(got, want), "pallas gather mismatch"
    print("pallas gather oracle: OK")

    # ---- timing, like-for-like coupling (eps on the table operand) ----
    def step_pallas(c, wb, idx):
        bt2 = c + 1e-9 * c[:1, :1, :1]
        out = pallas_gather(bt2, wb, idx)
        return c + 1e-12 * out[:1, :1, :1]

    ms_p = loop_time_ms(step_pallas, Bt, iters=16, args=(wblk_d, lane_d))

    cols_d = jnp.asarray(cols)

    def step_xla(c, ci):
        b2 = c + 1e-9 * c[:1, :1]
        out = jnp.take(b2, ci, axis=0)
        return c + 1e-12 * out[:1, :1]

    ms_x = loop_time_ms(step_xla, B, iters=16, args=(cols_d,))

    # bonus: is the 6.2 ns/row transaction-bound or byte-bound?  A bf16
    # table halves row bytes; if this halves the time, an opt-in
    # reduced-precision wcoo SpMM (gather bf16 B, ~1e-3 rel) is on the
    # table.  Unchanged time = per-row transaction cost, close the idea.
    B16 = B.astype(jnp.bfloat16)

    def step_xla16(c, ci):
        b2 = c + jnp.bfloat16(1e-2) * c[:1, :1]
        out = jnp.take(b2, ci, axis=0)
        return c + jnp.bfloat16(1e-2) * out[:1, :1]

    ms_x16 = loop_time_ms(step_xla16, B16, iters=16, args=(cols_d,))

    print(f"pallas column-window gather: {ms_p:.2f} ms "
          f"({ms_p * 1e6 / nnz:.2f} ns/row incl. fill)")
    print(f"XLA flat row gather:         {ms_x:.2f} ms "
          f"({ms_x * 1e6 / nnz:.2f} ns/row)")
    print(f"XLA flat row gather (bf16):  {ms_x16:.2f} ms "
          f"({ms_x16 * 1e6 / nnz:.2f} ns/row)")
    bridge = 6.2e-6 * nnz  # measured r3: 64-wide row permutation, ms
    print(f"go/no-go: unfused total = pallas {ms_p:.1f} + bridge "
          f"~{bridge:.1f} ms (64-wide permutation, r3 constant) "
          f"{'< ' if ms_p + bridge < ms_x else '>='} status quo "
          f"{ms_x:.1f} ms; fused form killed by reduce fill above")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
