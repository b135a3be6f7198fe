"""Deterministic synthetic sparse-matrix generators.

The reference ships one fixture (ash85.mtx — 85x85 pattern-symmetric, 304
stored entries) and a download script for two SuiteSparse benchmark matrices
(matrices/get_matrices.sh: webbase-1M for SpMV, s3dkq4m2 for SpMM).  This
environment has no network egress, so the framework synthesizes
*structure-matched proxies* instead:

* `pattern_symmetric(...)`  — ash85-class smoke fixture;
* `webbase_like(...)`       — power-law row degrees, scattered columns
                              (webbase-1M is a web graph: 1M rows, ~3.1M nnz);
* `fem_banded_like(...)`    — banded FEM structure (s3dkq4m2: n=90449,
                              ~4.8M nnz, ~2.4k band), the SpMM workload.

All generators are seeded and return `CsrMatrix`/`CooMatrix` directly; the
`matrices/gen_matrices.py` CLI writes them as .mtx for file-path parity with
the reference drivers.
"""

from __future__ import annotations

import numpy as np

from ..containers import CooMatrix, CsrMatrix


def _dedupe(m, n, rows, cols, rng, values=None):
    coo = CooMatrix(rows.astype(np.int64), cols.astype(np.int64),
                    (values if values is not None
                     else rng.random_sample(len(rows))), (m, n))
    return coo.to_csr()


def pattern_symmetric(n: int = 85, nnz_target: int = 304, seed: int = 7
                      ) -> CsrMatrix:
    """ash85-class fixture: symmetric pattern matrix with unit values and a
    full diagonal (values all 1.0, like pattern->1.0 expansion)."""
    rng = np.random.RandomState(seed)
    k = max((nnz_target - n) // 2, 0)
    i = rng.randint(0, n, size=3 * k)
    j = rng.randint(0, n, size=3 * k)
    off = i != j
    i, j = i[off][:k], j[off][:k]
    rows = np.concatenate([np.arange(n), i, j])
    cols = np.concatenate([np.arange(n), j, i])
    vals = np.ones(len(rows), dtype=np.float64)
    csr = _dedupe(n, n, rows, cols, rng, vals)
    # duplicate-summed entries back to 1.0 to stay a pattern matrix
    return CsrMatrix(csr.row_ptr, csr.col_idx,
                     np.ones_like(csr.values), csr.shape)


def webbase_like(n: int = 1_000_000, avg_deg: float = 3.1, seed: int = 211,
                 dtype=np.float64) -> CsrMatrix:
    """Web-graph proxy: power-law out-degrees, near-uniform column targets.

    Matches webbase-1M's aggregate stats (n=1e6, nnz~3.1e6, max row degree in
    the thousands) without the actual data (zero-egress environment)."""
    rng = np.random.RandomState(seed)
    # Zipf-ish degrees clipped to n, scaled to hit avg_deg
    raw = rng.zipf(2.1, size=n).astype(np.int64)
    raw = np.minimum(raw, 5000)
    deg = np.maximum((raw * (avg_deg / raw.mean())).astype(np.int64), 1)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = rng.randint(0, n, size=len(rows)).astype(np.int64)
    vals = rng.random_sample(len(rows)).astype(dtype)
    return _dedupe(n, n, rows, cols, rng, vals)


def fem_banded_like(n: int = 90_449, half_band: int = 36, seed: int = 211,
                    dtype=np.float64) -> CsrMatrix:
    """FEM stiffness-matrix proxy (s3dkq4m2 class): symmetric banded
    structure, ~2*half_band+1 nnz per interior row (~4.8M nnz at defaults)."""
    rng = np.random.RandomState(seed)
    offsets = np.arange(-half_band, half_band + 1)
    rows_l, cols_l = [], []
    for off in offsets:
        r = np.arange(max(0, -off), min(n, n - off), dtype=np.int64)
        rows_l.append(r)
        cols_l.append(r + off)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = rng.random_sample(len(rows)).astype(dtype)
    return _dedupe(n, n, rows, cols, rng, vals)


def uniform_random(m: int, n: int, nnz_per_row: int, seed: int = 211,
                   dtype=np.float64) -> CsrMatrix:
    """Uniform random CSR with ~nnz_per_row entries per row."""
    rng = np.random.RandomState(seed)
    rows = np.repeat(np.arange(m, dtype=np.int64), nnz_per_row)
    cols = rng.randint(0, n, size=len(rows)).astype(np.int64)
    vals = rng.random_sample(len(rows)).astype(dtype)
    return _dedupe(m, n, rows, cols, rng, vals)


def adversarial_skew(m: int = 4096, n: int = 4096, heavy_rows: int = 4,
                     heavy_nnz: int = 2048, light_nnz: int = 2,
                     seed: int = 13, dtype=np.float64) -> CsrMatrix:
    """Pathologically skewed row distribution — exercises the nnz-balanced
    partitioner's row-straddling path (reference matrix.h:443-445) and the
    ELL blowup guard."""
    rng = np.random.RandomState(seed)
    hr = rng.choice(m, size=heavy_rows, replace=False)
    rows = [np.repeat(np.arange(m, dtype=np.int64), light_nnz),
            np.repeat(hr.astype(np.int64), heavy_nnz)]
    rows = np.concatenate(rows)
    cols = rng.randint(0, n, size=len(rows)).astype(np.int64)
    vals = rng.random_sample(len(rows)).astype(dtype)
    return _dedupe(m, n, rows, cols, rng, vals)
