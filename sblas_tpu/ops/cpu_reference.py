"""CPU oracle implementations of SpMV and SpMM.

These are the framework's correctness anchors, mirroring the reference's
sequential CPU paths (`sblas_spmm_csr_cpu` spmm.h:29-70, `sblas_spmv_csr_cpu`
spmv.h:15-32; "We verify the running results using the CPU implementation",
README.md:79).  Vectorized numpy instead of scalar loops, same math:

    spmv:  y <- beta * y + alpha * A @ x
    spmm:  C <- beta * C + alpha * A @ B

Note: the reference's row-major-C branch has a mixed-index bug
(spmm.h:51-52); our implementation is layout-free and correct for both
orders (documented deviation).
"""

from __future__ import annotations

import numpy as np

from ..containers import CsrMatrix, DenseMatrix, DenseVector
from ..utils.errors import ShapeError, require


def _csr_matvec(row_ptr, col_idx, values, x):
    contrib = values * x[col_idx]
    # segment-sum per row via reduceat; empty rows handled by diff==0 guard.
    out = np.zeros(len(row_ptr) - 1, dtype=np.result_type(values, x))
    nnz_per_row = np.diff(row_ptr)
    nz_rows = np.flatnonzero(nnz_per_row)
    if len(nz_rows):
        out[nz_rows] = np.add.reduceat(contrib, row_ptr[nz_rows])
    return out


def spmv_cpu(A: CsrMatrix, x: DenseVector, alpha: float, beta: float,
             y: DenseVector) -> np.ndarray:
    """y' = beta*y + alpha*A@x (reference sblas_spmv_csr_cpu, spmv.h:15-32)."""
    require(A.width == x.length, ShapeError,
            f"A width {A.width} != x length {x.length}")
    require(A.height == y.length, ShapeError,
            f"A height {A.height} != y length {y.length}")
    return beta * y.values + alpha * _csr_matvec(
        A.row_ptr, A.col_idx, A.values, x.values)


def spmm_cpu(A: CsrMatrix, B: DenseMatrix, alpha: float, beta: float,
             C: DenseMatrix) -> np.ndarray:
    """C' = beta*C + alpha*A@B (reference sblas_spmm_csr_cpu, spmm.h:29-70)."""
    require(A.width == B.height, ShapeError,
            f"A width {A.width} != B height {B.height}")
    require((A.height, B.width) == (C.height, C.width), ShapeError,
            f"C shape {(C.height, C.width)} != {(A.height, B.width)}")
    gathered = B.values[A.col_idx]                       # (nnz, K)
    contrib = A.values[:, None] * gathered
    out = np.zeros((A.height, B.width),
                   dtype=np.result_type(A.values, B.values))
    nnz_per_row = np.diff(A.row_ptr)
    nz_rows = np.flatnonzero(nnz_per_row)
    if len(nz_rows):
        out[nz_rows] = np.add.reduceat(contrib, A.row_ptr[nz_rows], axis=0)
    return beta * C.values + alpha * out
