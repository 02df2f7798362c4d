"""COO triplet container and Matrix-Market file IO.

Host-side (NumPy) equivalent of the reference's ``COOMatrix`` + MM reader
(reference: include/coomatrix.hpp:43-127, src/coomatrix.cpp:31-473).  IO and
assembly are not TPU math; they produce host arrays that are then converted to
the device CSR/BSR forms (see :mod:`blasted_tpu.sparse.convert`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["COOMatrix", "read_matrix_market", "read_matrix_market_vector",
           "write_matrix_market", "MatrixReadError"]


class MatrixReadError(RuntimeError):
    """Equivalent of the reference's MatrixReadException (src/coomatrix.cpp)."""


@dataclass
class COOMatrix:
    """Sorted COO triplets (row-major, columns sorted within rows)."""

    nrows: int
    ncols: int
    row: np.ndarray   # (nnz,) int32
    col: np.ndarray   # (nnz,) int32
    val: np.ndarray   # (nnz,) float64

    @property
    def nnz(self) -> int:
        return self.row.shape[0]

    def sorted(self) -> "COOMatrix":
        order = np.lexsort((self.col, self.row))
        return COOMatrix(self.nrows, self.ncols,
                         self.row[order], self.col[order], self.val[order])

    def sum_duplicates(self) -> "COOMatrix":
        m = self.sorted()
        key = m.row.astype(np.int64) * m.ncols + m.col
        uniq, inv = np.unique(key, return_inverse=True)
        val = np.zeros(uniq.shape[0], dtype=m.val.dtype)
        np.add.at(val, inv, m.val)
        row = (uniq // m.ncols).astype(np.int32)
        col = (uniq % m.ncols).astype(np.int32)
        return COOMatrix(m.nrows, m.ncols, row, col, val)


def read_matrix_market(path: str) -> COOMatrix:
    """Parse a Matrix-Market coordinate file.

    Supports real/integer/pattern fields and general/symmetric/skew-symmetric
    symmetry with off-diagonal expansion, matching the reference reader
    (src/coomatrix.cpp:31-210: header, size line, entries, symmetric expansion).
    """
    with open(path, "r") as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise MatrixReadError(f"{path}: not a MatrixMarket file")
        tok = header.strip().split()
        if len(tok) < 5:
            raise MatrixReadError(f"{path}: malformed header: {header!r}")
        _, obj, fmt, field, symm = tok[:5]
        obj, fmt = obj.lower(), fmt.lower()
        field, symm = field.lower(), symm.lower()
        if obj != "matrix" or fmt != "coordinate":
            raise MatrixReadError(f"{path}: only coordinate matrices supported here")
        if field == "complex":
            raise MatrixReadError(f"{path}: complex matrices unsupported")

        line = f.readline()
        while line.startswith("%") or line.strip() == "":
            line = f.readline()
        nrows, ncols, nnz = (int(s) for s in line.split())

        rows = np.empty(nnz, dtype=np.int32)
        cols = np.empty(nnz, dtype=np.int32)
        vals = np.empty(nnz, dtype=np.float64)
        k = 0
        for line in f:
            s = line.split()
            if not s:
                continue
            rows[k] = int(s[0]) - 1
            cols[k] = int(s[1]) - 1
            vals[k] = 1.0 if field == "pattern" else float(s[2])
            k += 1
        if k != nnz:
            raise MatrixReadError(f"{path}: expected {nnz} entries, found {k}")

    if symm in ("symmetric", "skew-symmetric", "hermitian"):
        off = rows != cols
        sign = -1.0 if symm == "skew-symmetric" else 1.0
        rows = np.concatenate([rows, cols[off]])
        cols = np.concatenate([cols, rows[: nnz][off]])
        vals = np.concatenate([vals, sign * vals[off]])

    return COOMatrix(nrows, ncols, rows, cols, vals).sorted()


def read_matrix_market_vector(path: str) -> np.ndarray:
    """Read a dense MM 'array' file as a vector (reference: src/coomatrix.cpp
    readDenseMatrixMarket, used for stored x/b test fixtures)."""
    with open(path, "r") as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise MatrixReadError(f"{path}: not a MatrixMarket file")
        tok = header.strip().split()
        fmt = tok[2].lower()
        line = f.readline()
        while line.startswith("%") or line.strip() == "":
            line = f.readline()
        if fmt == "array":
            sizes = [int(s) for s in line.split()]
            nrows = sizes[0]
            ncols = sizes[1] if len(sizes) > 1 else 1
            data = np.loadtxt(f, dtype=np.float64).reshape(-1)
            if data.shape[0] != nrows * ncols:
                raise MatrixReadError(f"{path}: bad array size")
            return data
        elif fmt == "coordinate":
            nrows, ncols, nnz = (int(s) for s in line.split())
            out = np.zeros(nrows * ncols, dtype=np.float64)
            for line in f:
                s = line.split()
                if not s:
                    continue
                i, j = int(s[0]) - 1, int(s[1]) - 1
                out[i + j * nrows] = float(s[2])
            return out
        raise MatrixReadError(f"{path}: unknown format {fmt}")


def write_matrix_market(path: str, m: COOMatrix) -> None:
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{m.nrows} {m.ncols} {m.nnz}\n")
        for r, c, v in zip(m.row, m.col, m.val):
            f.write(f"{r + 1} {c + 1} {v:.17g}\n")
