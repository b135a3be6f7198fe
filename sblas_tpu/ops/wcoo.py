"""Windowed-COO plan: gather/scatter-free unstructured SpMV/SpMM.

The TPU has no fast elementwise gather or scatter — XLA lowers both at
~7 ns/element, which caps a naive COO SpMV (gather x + segment_sum) at
~0.06 Gnnz/s.  This layout reformulates both halves as operations the
hardware is actually good at:

* **x-gather -> block row-gather + one-hot lane pick.**  x is viewed as
  (n/128, 128) lane blocks; each nnz fetches its whole 128-wide block with
  XLA's fast row gather, then selects its lane with a one-hot multiply
  (VPU, fuses into the gather).  Measured 4x over elementwise take.

* **row-scatter -> one-hot MXU segmented reduce over row windows.**  nnz
  are tiled 128-at-a-time in CSR order; the planner assigns each tile a
  128-aligned row *window* of depth 256 that contains all its rows (tiles
  are split when empty-row gaps would overflow the window).  Per tile, a
  one-hot of the in-window row index turns the segmented sum into a batched
  (1x128)@(128x256) matmul — MXU work, exact in f32 at HIGH (bf16x3)
  precision because the one-hot operand splits exactly into (1, 0, 0)
  bf16 terms, so every product reconstructs the full f32 contribution.
  Window halves are then added into the 128-row-block grid of y with one
  short segment-sum over 2T rows of 128 lanes (vectorized, not
  elementwise; ids nearly sorted in tile order).  Measured 20x over
  segment_sum.

No reference analog: cuSPARSE hides this problem on GPUs (spmm.h:146-149);
on TPU it is the difference between 0.06 and >0.4 Gnnz/s.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, SBlasConfig
from ..containers import CsrMatrix

TILE = 128          # nnz per tile (one lane row)
WINDOW = 256        # row-window depth (two 128 blocks)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=["xblk", "lane", "vals", "relrow", "half_ids"],
         meta_fields=["shape", "nnz", "n_tiles", "n_row_blocks"])
@dataclasses.dataclass(frozen=True)
class WcooPlan:
    """Windowed COO layout (see module docstring).

    xblk: (T*TILE,) i32   column block id of each nnz (col // 128)
    lane: (T*TILE,) i32   lane within the block (col % 128)
    vals: (T*TILE,)       values (padding slots are 0)
    relrow: (T, TILE) i32 row - window_start, in [0, WINDOW)
    half_ids: (2T,) i32   destination row-block id of each window half,
                          in tile order (nearly sorted — windows are
                          monotone in CSR order; the scatter-add takes
                          them unsorted, which measured FASTER than
                          pre-permuting into sorted order: 12.6 vs
                          21.2 ms on v5e for the 2T=47k-half webbase case)
    """

    xblk: jax.Array
    lane: jax.Array
    vals: jax.Array
    relrow: jax.Array
    half_ids: jax.Array
    shape: Tuple[int, int]
    nnz: int
    n_tiles: int
    n_row_blocks: int

    @property
    def fill_ratio(self) -> float:
        """Stored slots / true nnz (tile-split + padding overhead)."""
        return self.vals.shape[0] / max(self.nnz, 1)

    @classmethod
    def from_csr(cls, A: CsrMatrix, dtype=jnp.float32,
                 config: SBlasConfig = DEFAULT, *,
                 min_tiles: int = 0) -> "WcooPlan":
        """`min_tiles` pads the tile count up to a shared static size (pad
        tiles carry val=0 anchored at window 0 and contribute nothing) —
        used by the band-streaming/distributed layers so per-band plans
        share one shape and one compiled kernel."""
        arr = wcoo_arrays(A, min_tiles=min_tiles)
        np_val = np.dtype(jnp.dtype(dtype).name)
        return cls(
            xblk=jnp.asarray(arr["xblk"], jnp.int32),
            lane=jnp.asarray(arr["lane"], jnp.int32),
            vals=jnp.asarray(arr["vals"].astype(np_val), dtype),
            relrow=jnp.asarray(arr["relrow"], jnp.int32),
            half_ids=jnp.asarray(arr["half_ids"], jnp.int32),
            shape=A.shape, nnz=A.nnz, n_tiles=arr["n_tiles"],
            n_row_blocks=arr["n_row_blocks"])


def wcoo_tile_count(A: CsrMatrix) -> int:
    """Natural tile count of the windowed-COO layout — just the greedy
    tiling loop, no array construction (the cheap probe the band layers
    use for shared static dims; a full wcoo_arrays pass here would double
    plan-build cost)."""
    rows = np.repeat(np.arange(A.shape[0], dtype=np.int64), A.row_nnz)
    nnz = A.nnz
    if not nnz:
        return 1
    anchors = (rows // 128 + WINDOW // 128) * 128
    limit = np.searchsorted(rows, anchors, side="left")
    count, i = 0, 0
    while i < nnz:
        count += 1
        i = min(i + TILE, int(limit[i]))
    return count


def wcoo_arrays(A: CsrMatrix, min_tiles: int = 0) -> dict:
    """Windowed-COO layout as host numpy arrays (kept numpy-pure so
    callers control placement — device HBM for single-chip plans, pinned
    host for the UM-analog band streamer)."""
    m, n = A.shape
    coo = A.to_coo()  # CSR order: rows ascending
    rows = coo.row_idx
    nnz = A.nnz

    # --- greedy tiling: <= TILE nnz per tile, all rows inside the
    # 128-aligned window of depth WINDOW anchored at the tile's first row
    if nnz:
        # limit[i]: first j whose row leaves the window anchored at i
        anchors = (rows // 128 + WINDOW // 128) * 128
        limit = np.searchsorted(rows, anchors, side="left")
        starts = []
        i = 0
        while i < nnz:
            starts.append(i)
            i = min(i + TILE, int(limit[i]))
        starts = np.asarray(starts, dtype=np.int64)
    else:
        starts = np.zeros(1, dtype=np.int64)
    T_real = len(starts)
    T = max(T_real, int(min_tiles))
    ends = np.concatenate([starts[1:], [nnz]])
    counts = np.pad(ends - starts, (0, T - T_real))

    # --- scatter nnz into (T, TILE) slots
    slot_tile = np.repeat(np.arange(T), counts)
    slot_pos = np.arange(nnz) - np.repeat(starts, counts[:T_real])
    vals = np.zeros((T, TILE), dtype=A.values.dtype)
    xblk = np.zeros((T, TILE), dtype=np.int64)
    lane = np.zeros((T, TILE), dtype=np.int64)
    relrow = np.zeros((T, TILE), dtype=np.int64)
    window = np.zeros(T, dtype=np.int64)
    if nnz:
        window[:T_real] = (rows[starts] // 128) * 128
        vals[slot_tile, slot_pos] = coo.values
        xblk[slot_tile, slot_pos] = coo.col_idx // 128
        lane[slot_tile, slot_pos] = coo.col_idx % 128
        relrow[slot_tile, slot_pos] = rows - window[slot_tile]
    assert relrow.max(initial=0) < WINDOW

    # --- static scatter schedule: two 128-row halves per tile, kept in
    # tile order (nearly sorted; see the dataclass docstring)
    half_ids = np.stack([window // 128, window // 128 + 1],
                        axis=1).reshape(-1)          # (2T,)
    m_pad = _round_up(max(m, 1), 128)
    n_row_blocks = m_pad // 128 + 1  # +1: windows may overhang the edge

    return {
        "xblk": xblk.reshape(-1).astype(np.int32),
        "lane": lane.reshape(-1).astype(np.int32),
        "vals": vals.reshape(-1),
        "relrow": relrow.astype(np.int32),
        "half_ids": half_ids.astype(np.int32),
        "n_tiles": T,
        "n_row_blocks": n_row_blocks,
    }


def _x_blocks(plan: WcooPlan, x):
    n_pad = _round_up(plan.shape[1], 128)
    return jnp.pad(x, (0, n_pad - x.shape[0])).reshape(-1, 128)


def _gathered_contrib(plan: WcooPlan, x):
    """contrib[i] = vals[i] * x[cols[i]] without elementwise gather."""
    blocks = jnp.take(_x_blocks(plan, x), plan.xblk, axis=0)  # (T*TILE, 128)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, blocks.shape, 1)
              == plan.lane[:, None])
    picked = jnp.where(onehot, blocks, 0).sum(axis=1)
    return plan.vals * picked


def _window_reduce(plan: WcooPlan, contrib):
    """(T*TILE,) contributions -> (n_row_blocks*128,) y via one-hot MXU."""
    T = plan.n_tiles
    ct = contrib.reshape(T, TILE)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, TILE, WINDOW), 2)
              == plan.relrow[:, :, None]).astype(contrib.dtype)
    part = jax.lax.dot_general(  # (T, WINDOW) = sum_n ct * onehot
        ct[:, None, :], onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=contrib.dtype,
        precision=jax.lax.Precision.HIGH)[:, 0, :]
    halves = part.reshape(2 * T, 128)
    y_blocks = jax.ops.segment_sum(halves, plan.half_ids,
                                   num_segments=plan.n_row_blocks)
    return y_blocks.reshape(-1)


@jax.jit
def spmv_wcoo(plan: WcooPlan, x: jax.Array, alpha, beta,
              y: jax.Array) -> jax.Array:
    m = plan.shape[0]
    ax = _window_reduce(plan, _gathered_contrib(plan, x))[:m]
    return beta * y + alpha * ax


# Transient-intermediate cap for spmm_wcoo, in elements (~2 GB of f32):
# bounds the (T, WINDOW, kc) window partials by chunking over B COLUMNS.
# Tile-chunking via lax.scan is NOT an option: any gather inside a scan
# lowers ~6x slower than the same gather flat (measured v5e: 97.9 ms vs
# 15.7 ms for 3M B-row fetches).
_MAX_PART_ELEMS = 512 * 1024 * 1024


@partial(jax.jit, static_argnames=("k_chunk",))
def spmm_wcoo(plan: WcooPlan, B: jax.Array, alpha, beta, C: jax.Array,
              k_chunk: int = None) -> jax.Array:
    """SpMM with the same layout: whole B rows replace the lane pick
    (B-row gather is already block-granular), windows reduce via batched
    MXU matmuls.  Gathers stay FLAT (see _MAX_PART_ELEMS note); large K
    is column-chunked instead."""
    m, k = plan.shape[0], B.shape[1]
    T = plan.n_tiles
    n_pad = _round_up(plan.shape[1], 128)
    cols = plan.xblk * 128 + plan.lane
    B_p = jnp.pad(B, ((0, n_pad - B.shape[0]), (0, 0)))

    kc = k_chunk or max(min(k, _MAX_PART_ELEMS // max(T * WINDOW, 1)), 1)
    outs = []
    for k0 in range(0, k, kc):
        k1 = min(k0 + kc, k)
        # built per chunk so the iota-compare fuses into its one dot
        # instead of materializing a (T, TILE, WINDOW) tensor
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, TILE, WINDOW), 2)
                  == plan.relrow[:, :, None]).astype(B.dtype)
        gathered = jnp.take(B_p[:, k0:k1], cols, axis=0)  # (T*TILE, kc)
        ct = (plan.vals[:, None] * gathered).reshape(T, TILE, k1 - k0)
        part = jax.lax.dot_general(  # (T, WINDOW, kc)
            onehot, ct,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=ct.dtype,
            precision=jax.lax.Precision.HIGH)
        halves = part.reshape(2 * T, 128, k1 - k0)
        c_blocks = jax.ops.segment_sum(halves, plan.half_ids,
                                       num_segments=plan.n_row_blocks)
        outs.append(c_blocks.reshape(-1, k1 - k0)[:m])
    ab = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return beta * C + alpha * ab
