"""Matrix Market (.mtx) ingestion and emission, pure Python/numpy.

TPU-first re-build of the reference's two I/O layers:

* low-level (reference mmio.h: NIST banner parse `mm_read_banner` mmio.h:254,
  typecode queries mmio.h:36-51, size readers mmio.h:339, writers mmio.h:398,445)
  -> `MMHeader`, `read_header`, `read_coo`, `write_mtx`.
* high-level CSR loader (reference mmio_highlevel.h: two-pass `mmio_info`
  mmio_highlevel.h:7 + `mmio_data` mmio_highlevel.h:130) -> `read_csr_arrays`.

Semantics reproduced from the reference:
* symmetric matrices are expanded — every off-diagonal stored entry is
  mirrored (mmio_highlevel.h:95-100 double-counts off-diagonals, :242-263
  mirror-inserts), diagonal entries stored once;
* pattern matrices get value 1.0 (mmio_highlevel.h:195-205);
* integer fields are read as the value dtype;
* complex fields keep the real part for real-valued containers (the
  reference's `mmio_data` reads only the first value of each complex pair);
* indices convert from 1-based file to 0-based arrays.

Improvements over the reference (documented deviations):
* skew-symmetric mirrors with negation and hermitian with conjugation —
  the reference folds both into the symmetric path;
* duplicate (i, j) entries are summed during CSR conversion (scipy
  convention); the reference inserts them twice;
* the COO path shares this loader, fixing the reference quirk where
  `CooSparseMatrix`'s private fscanf loop ignores pattern/symmetric
  typecodes entirely (matrix.h:169-176).

Parsing is vectorized with numpy's C text parser (`np.loadtxt`); a faster
native (C++) parser can be plugged in via `sblas_tpu.io.native`.
"""

from __future__ import annotations

import dataclasses
import io as _io
from typing import Tuple

import numpy as np

from ..utils.errors import FormatError, require

BANNER = "%%MatrixMarket"

_FORMATS = ("coordinate", "array")
_FIELDS = ("real", "integer", "complex", "pattern")
_SYMMETRIES = ("general", "symmetric", "skew-symmetric", "hermitian")


@dataclasses.dataclass(frozen=True)
class MMHeader:
    """Parsed Matrix-Market banner + size line (reference: the MM_typecode
    char[4] of mmio.h:53 plus the outputs of mm_read_mtx_crd_size)."""

    fmt: str        # "coordinate" | "array"
    field: str      # "real" | "integer" | "complex" | "pattern"
    symmetry: str   # "general" | "symmetric" | "skew-symmetric" | "hermitian"
    nrows: int
    ncols: int
    nnz_stored: int  # entries stored in the file (array fmt: nrows*ncols)

    # --- typecode queries (reference mmio.h:36-51) ---
    @property
    def is_sparse(self) -> bool:
        return self.fmt == "coordinate"

    @property
    def is_dense(self) -> bool:
        return self.fmt == "array"

    @property
    def is_pattern(self) -> bool:
        return self.field == "pattern"

    @property
    def is_complex(self) -> bool:
        return self.field == "complex"

    @property
    def is_general(self) -> bool:
        return self.symmetry == "general"

    @property
    def is_symmetric(self) -> bool:
        return self.symmetry == "symmetric"

    @property
    def is_skew(self) -> bool:
        return self.symmetry == "skew-symmetric"

    @property
    def is_hermitian(self) -> bool:
        return self.symmetry == "hermitian"

    @property
    def needs_mirror(self) -> bool:
        return self.symmetry != "general"


def _parse_banner(line: str) -> Tuple[str, str, str]:
    parts = line.strip().split()
    require(len(parts) >= 5 and parts[0] == BANNER,
            FormatError, f"missing/invalid MatrixMarket banner: {line!r}")
    obj, fmt, field, symmetry = (p.lower() for p in parts[1:5])
    require(obj == "matrix", FormatError, f"unsupported MM object {obj!r}")
    require(fmt in _FORMATS, FormatError, f"unsupported MM format {fmt!r}")
    require(field in _FIELDS, FormatError, f"unsupported MM field {field!r}")
    require(symmetry in _SYMMETRIES, FormatError,
            f"unsupported MM symmetry {symmetry!r}")
    return fmt, field, symmetry


def read_header(path: str) -> MMHeader:
    """Parse banner, skip comments, read the size line.

    Single-pass analog of the reference's `mm_read_banner` (mmio.h:254) +
    `mm_read_mtx_crd_size` (mmio.h:339) / `mm_read_mtx_array_size`.
    """
    with open(path, "rt") as f:
        banner = f.readline()
        fmt, field, symmetry = _parse_banner(banner)
        size_line = f.readline()
        while size_line and (size_line.startswith("%") or not size_line.strip()):
            size_line = f.readline()
        require(bool(size_line), FormatError, "premature EOF before size line")
        parts = size_line.split()
        if fmt == "coordinate":
            require(len(parts) == 3, FormatError,
                    f"bad coordinate size line: {size_line!r}")
            nrows, ncols, nnz = (int(p) for p in parts)
        else:
            require(len(parts) == 2, FormatError,
                    f"bad array size line: {size_line!r}")
            nrows, ncols = (int(p) for p in parts)
            nnz = nrows * ncols
        return MMHeader(fmt, field, symmetry, nrows, ncols, nnz)


def _data_offset(path: str) -> int:
    """Byte offset of the first data line (after banner/comments/size)."""
    with open(path, "rb") as f:
        f.readline()  # banner
        while True:
            pos = f.tell()
            line = f.readline()
            if not line:
                return pos
            s = line.strip()
            if s and not s.startswith(b"%"):
                return f.tell()  # this was the size line; data starts next


def read_coo(path: str, value_dtype=np.float64):
    """Read a .mtx file into raw (expanded) COO triplets.

    Returns (header, row_idx[int64], col_idx[int64], values[value_dtype]).
    Indices are 0-based; symmetry is already expanded (mirror insertion per
    mmio_highlevel.h:242-263); pattern values are 1.0
    (mmio_highlevel.h:195-205).  Duplicates are NOT merged here.
    """
    header = read_header(path)
    offset = _data_offset(path)

    if header.is_sparse and header.nnz_stored > 0:
        triplets = _read_coordinate_native(header, path, offset, value_dtype)
        if triplets is not None:
            row_idx, col_idx, values = triplets
            require(bool((row_idx >= 0).all()
                         and (row_idx < header.nrows).all()
                         and (col_idx >= 0).all()
                         and (col_idx < header.ncols).all()),
                    FormatError, "index out of declared bounds")
            row_idx, col_idx, values = _expand_symmetry(
                header, row_idx, col_idx, values)
            return header, row_idx, col_idx, values

    if header.is_pattern:
        ncol_file = 2
    elif header.is_complex:
        ncol_file = 4
    else:
        ncol_file = 3

    with open(path, "rb") as f:
        f.seek(offset)
        raw = np.loadtxt(f, dtype=np.float64, ndmin=2,
                         max_rows=header.nnz_stored if header.is_sparse else None)

    if header.is_dense:
        # array format: column-major stream of values (MM spec).  Symmetric
        # variants store only the lower triangle (i >= j), per column.
        vals = raw.reshape(-1)
        if header.is_complex:
            vals = vals.reshape(-1, 2)
            vals = (vals[:, 0] + 1j * vals[:, 1]
                    if np.issubdtype(value_dtype, np.complexfloating)
                    else vals[:, 0])
        if header.needs_mirror:
            # symmetric/hermitian array files store the lower triangle
            # INCLUDING the diagonal; skew-symmetric files store only the
            # STRICT lower triangle (the diagonal is identically zero, MM
            # spec) — including it here rejected every valid skew file
            # with a length mismatch
            lo = 1 if header.is_skew else 0
            cols_f = np.concatenate(
                [np.full(max(header.nrows - j - lo, 0), j)
                 for j in range(header.ncols)])
            rows_f = np.concatenate(
                [np.arange(j + lo, header.nrows)
                 for j in range(header.ncols)])
        else:
            rows_f, cols_f = np.meshgrid(np.arange(header.nrows),
                                         np.arange(header.ncols), indexing="ij")
            rows_f = rows_f.T.reshape(-1)  # column-major stream order
            cols_f = cols_f.T.reshape(-1)
        require(len(vals) == len(rows_f), FormatError,
                "array data length mismatch")
        return (header,) + _expand_symmetry(
            header, rows_f.astype(np.int64), cols_f.astype(np.int64),
            vals.astype(value_dtype))

    require(raw.shape[0] == header.nnz_stored, FormatError,
            f"expected {header.nnz_stored} entries, file has {raw.shape[0]}")
    if header.nnz_stored == 0:
        empty = np.zeros(0, dtype=np.int64)
        return header, empty, empty.copy(), np.zeros(0, dtype=value_dtype)
    require(raw.shape[1] == ncol_file, FormatError,
            f"expected {ncol_file} columns per entry, got {raw.shape[1]}")

    row_idx = raw[:, 0].astype(np.int64) - 1
    col_idx = raw[:, 1].astype(np.int64) - 1
    require(bool((row_idx >= 0).all() and (row_idx < header.nrows).all()
                 and (col_idx >= 0).all() and (col_idx < header.ncols).all()),
            FormatError, "index out of declared bounds")
    if header.is_pattern:
        values = np.ones(len(row_idx), dtype=value_dtype)
    elif header.is_complex and not np.issubdtype(value_dtype, np.complexfloating):
        values = raw[:, 2].astype(value_dtype)  # real part only
    elif header.is_complex:
        values = (raw[:, 2] + 1j * raw[:, 3]).astype(value_dtype)
    else:
        values = raw[:, 2].astype(value_dtype)

    row_idx, col_idx, values = _expand_symmetry(header, row_idx, col_idx, values)
    return header, row_idx, col_idx, values


def _read_coordinate_native(header: MMHeader, path: str, offset: int,
                            value_dtype):
    """Fast path: parse the data section with the C++ library
    (sblas_tpu.io.native -> native/mtxparse.cpp).  Returns None when the
    native tier is unavailable or fails — callers fall back to numpy."""
    from . import native
    if not native.available():
        return None
    try:
        out = native.parse_coordinate(path, offset, header.nnz_stored,
                                      header.field)
    except RuntimeError:
        return None
    if header.is_complex:
        rows, cols, vals, imag = out
        if np.issubdtype(value_dtype, np.complexfloating):
            values = (vals + 1j * imag).astype(value_dtype)
        else:
            values = vals.astype(value_dtype)  # real part only
    else:
        rows, cols, vals = out
        values = vals.astype(value_dtype)
    return rows, cols, values


def _expand_symmetry(header: MMHeader, row_idx, col_idx, values):
    """Mirror off-diagonal entries for symmetric/skew/hermitian files.

    Matches mmio_highlevel.h:95-100 (count off-diagonals twice) and
    :242-263 (insert (j,i) alongside (i,j)).  Skew negates, hermitian
    conjugates (improvement over the reference, which treats both as plain
    symmetric).
    """
    if not header.needs_mirror:
        return row_idx, col_idx, values
    off = row_idx != col_idx
    mirror_vals = values[off]
    if header.is_skew:
        mirror_vals = -mirror_vals
    elif header.is_hermitian and np.issubdtype(values.dtype, np.complexfloating):
        mirror_vals = np.conj(mirror_vals)
    row_out = np.concatenate([row_idx, col_idx[off]])
    col_out = np.concatenate([col_idx, row_idx[off]])
    val_out = np.concatenate([values, mirror_vals])
    return row_out, col_out, val_out


def coo_to_csr_arrays(nrows: int, row_idx, col_idx, values, sum_duplicates=True):
    """Convert COO triplets to CSR (row_ptr, col_idx, values), sorted by
    (row, col).  Duplicate coordinates are summed (scipy convention;
    documented deviation — the reference keeps duplicates,
    mmio_highlevel.h:242-263)."""
    from ..utils.hostmath import lexsort2
    order = lexsort2(col_idx, row_idx)
    r, c, v = row_idx[order], col_idx[order], values[order]
    if sum_duplicates and len(r):
        keep = np.empty(len(r), dtype=bool)
        keep[0] = True
        np.not_equal(r[1:], r[:-1], out=keep[1:])
        same_col = c[1:] == c[:-1]
        keep[1:] |= ~same_col  # keep when either row or col differs
        if not keep.all():
            group = np.cumsum(keep) - 1
            v = np.bincount(group, weights=v.real).astype(values.dtype) \
                if not np.issubdtype(values.dtype, np.complexfloating) \
                else (np.bincount(group, weights=v.real)
                      + 1j * np.bincount(group, weights=v.imag)).astype(values.dtype)
            r, c = r[keep], c[keep]
    row_ptr = np.zeros(nrows + 1, dtype=np.int64)
    np.add.at(row_ptr, r + 1, 1)
    np.cumsum(row_ptr, out=row_ptr)
    return row_ptr, c, v


def read_csr_arrays(path: str, value_dtype=np.float64):
    """High-level .mtx -> CSR loader.

    Functional equivalent of the reference's two-pass
    `mmio_info` + `mmio_data` (mmio_highlevel.h:7,130): returns
    (header, row_ptr, col_idx, values) with symmetry expanded,
    pattern -> 1.0, 0-based indices, rows sorted.
    """
    header, r, c, v = read_coo(path, value_dtype)
    row_ptr, col_idx, values = coo_to_csr_arrays(header.nrows, r, c, v)
    return header, row_ptr, col_idx, values


def write_mtx(path: str, nrows: int, ncols: int, row_idx, col_idx, values,
              field: str = "real", symmetry: str = "general",
              comment: str = "") -> None:
    """Write COO triplets as a coordinate .mtx file.

    Analog of the reference's (unused) writers `mm_write_banner` (mmio.h:398)
    and `mm_write_mtx_crd` (mmio.h:445); gives the framework a
    checkpoint/interchange path the reference only half had.
    """
    require(field in _FIELDS, FormatError, f"bad field {field!r}")
    require(symmetry in _SYMMETRIES, FormatError, f"bad symmetry {symmetry!r}")
    buf = _io.StringIO()
    buf.write(f"{BANNER} matrix coordinate {field} {symmetry}\n")
    for line in comment.splitlines():
        buf.write(f"% {line}\n")
    buf.write(f"{nrows} {ncols} {len(row_idx)}\n")
    r1 = np.asarray(row_idx) + 1
    c1 = np.asarray(col_idx) + 1
    if field == "pattern":
        np.savetxt(buf, np.column_stack([r1, c1]), fmt="%d %d")
    elif field == "complex":
        v = np.asarray(values)
        np.savetxt(buf, np.column_stack([r1, c1, v.real, v.imag]),
                   fmt="%d %d %.17g %.17g")
    elif field == "integer":
        np.savetxt(buf, np.column_stack([r1, c1, np.asarray(values)]),
                   fmt="%d %d %d")
    else:
        np.savetxt(buf, np.column_stack([r1, c1, np.asarray(values)]),
                   fmt="%d %d %.17g")
    with open(path, "wt") as f:
        f.write(buf.getvalue())
