"""Host-side format conversions and matrix utilities.

Equivalents of the reference's converters and raw-matrix utilities:
- COO→CSR / COO→BSR       (reference: include/coomatrix.hpp:100-127, src/coomatrix.cpp:236-473)
- BSR→BSC (CSC transpose) (reference: src/scmatrix.cpp:29-154)
- symmetric Jacobi scaling vector 1/sqrt(a_ii)
                           (reference: src/rawsrmatrixutils.cpp:341-349)
- column adjacency         (reference: src/adjacency.cpp, include/adjacency.hpp:14-44)

All run on host NumPy at setup time (the reference computes these once per
matrix too); outputs feed the device pytrees.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bsr import BSRMatrix
from .coo import COOMatrix
from .csr import CSRMatrix

__all__ = [
    "csr_from_coo", "bsr_from_coo", "csr_from_bsr", "bsr_to_csc",
    "scaling_vector", "column_adjacency", "CSCMatrix",
]


def csr_from_coo(m: COOMatrix) -> CSRMatrix:
    """COO→CSR with per-row sorted columns (reference: src/coomatrix.cpp
    convertToCSR, :236-300)."""
    m = m.sum_duplicates()
    n = m.nrows
    rowptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(rowptr[1:], m.row, 1)
    rowptr = np.cumsum(rowptr, dtype=np.int32)
    return CSRMatrix.from_arrays(rowptr, m.col, m.val)


def bsr_from_coo(m: COOMatrix, bs: int) -> BSRMatrix:
    """COO→BSR: group scalar entries into bs×bs blocks
    (reference: src/coomatrix.cpp convertToBSR, :302-473)."""
    if m.nrows % bs or m.ncols % bs:
        raise ValueError(f"matrix size {m.nrows} not divisible by block size {bs}")
    m = m.sum_duplicates()
    brow = m.row // bs
    bcol = m.col // bs
    key = brow.astype(np.int64) * (m.ncols // bs) + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    nnzb = uniq.shape[0]
    nbcols = m.ncols // bs
    vals = np.zeros((nnzb, bs, bs), dtype=m.val.dtype)
    vals[inv, m.row % bs, m.col % bs] = m.val
    ubrow = (uniq // nbcols).astype(np.int32)
    ubcol = (uniq % nbcols).astype(np.int32)
    nbrows = m.nrows // bs
    rowptr = np.zeros(nbrows + 1, dtype=np.int32)
    np.add.at(rowptr[1:], ubrow, 1)
    rowptr = np.cumsum(rowptr, dtype=np.int32)
    return BSRMatrix.from_arrays(rowptr, ubcol, vals, bs)


def csr_from_bsr(A: BSRMatrix) -> CSRMatrix:
    """Expand a BSR matrix to scalar CSR (for oracles and scalar paths)."""
    import scipy.sparse as sps

    sp = sps.bsr_matrix(
        (np.asarray(A.vals), np.asarray(A.colind), np.asarray(A.rowptr)),
        shape=(A.nrows, A.nrows),
    ).tocsr()
    sp.sort_indices()
    # NOTE: explicit zeros are kept — the scalar pattern must stay the block
    # pattern expanded, exactly as in the reference's block containers.
    return CSRMatrix.from_scipy(sp)


@dataclass
class CSCMatrix:
    """Compressed-sparse-column storage (reference: include/scmatrixdefs.hpp:15-52)."""

    colptr: np.ndarray   # (n+1,) int32
    rowind: np.ndarray   # (nnz,) int32
    vals: np.ndarray     # (nnz, ...) — scalar (nnz,) or block (nnzb, bs, bs)
    diagind: np.ndarray  # (n,) int32, -1 where a column has no diagonal entry

    @property
    def nbcols(self) -> int:
        return self.colptr.shape[0] - 1


def bsr_to_csc(rowptr, colind, vals) -> CSCMatrix:
    """(B)SR → (B)SC conversion: bucket by column, sort rows within columns
    (reference: src/scmatrix.cpp:29-154)."""
    rowptr = np.asarray(rowptr)
    colind = np.asarray(colind)
    vals = np.asarray(vals)
    n = rowptr.shape[0] - 1
    rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(rowptr))
    order = np.lexsort((rows, colind))
    srows = rows[order]
    scols = colind[order]
    svals = vals[order]
    colptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(colptr[1:], scols, 1)
    colptr = np.cumsum(colptr, dtype=np.int32)
    diagind = np.full(n, -1, dtype=np.int32)
    on_diag = np.nonzero(srows == scols)[0]
    diagind[scols[on_diag]] = on_diag
    return CSCMatrix(colptr, srows, svals, diagind)


def scaling_vector(A) -> np.ndarray:
    """Symmetric Jacobi scaling: scale_i = 1/sqrt(a_ii), pointwise over block
    diagonals (reference: getScalingVector, src/rawsrmatrixutils.cpp:341-349)."""
    if isinstance(A, BSRMatrix):
        d = np.asarray(A.vals)[np.asarray(A.diagind)]          # (nbrows, bs, bs)
        diag = np.diagonal(d, axis1=-2, axis2=-1).reshape(-1)  # (nbrows*bs,)
    else:
        diag = np.asarray(A.vals)[np.asarray(A.diagind)]
    return 1.0 / np.sqrt(diag)


def column_adjacency(rowptr, colind):
    """Column-oriented adjacency: for each column, the rows containing it and
    the positions of those entries in the nnz array
    (reference: include/adjacency.hpp:14-44, src/adjacency.cpp)."""
    csc = bsr_to_csc(rowptr, colind, np.arange(np.asarray(colind).shape[0], dtype=np.int32))
    return csc.colptr, csc.rowind, csc.vals  # vals holds the value-locations
