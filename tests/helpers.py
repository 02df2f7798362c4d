"""Shared test fixtures: random sparse matrices with guaranteed diagonals.

Plays the role of the reference's golden input matrices (tests/input/*.mtx):
since we cannot copy those files, tests use (a) seeded random sparse systems
with diagonal dominance knobs, and (b) the built-in Poisson-3D generator —
the same strategy the reference uses for its poisson3d-fd fixture.
"""

import numpy as np
import scipy.sparse as sps

from blasted_tpu.sparse import BSRMatrix, CSRMatrix
from blasted_tpu.sparse.coo import COOMatrix
from blasted_tpu.sparse.convert import bsr_from_coo, csr_from_coo


def random_csr(n, density=0.05, diag_boost=2.0, seed=0) -> CSRMatrix:
    """Random sparse matrix with full diagonal; row-diagonally dominant when
    diag_boost >= 1 (so GS/ILU fixed points converge, as with the reference's
    CFD test matrices)."""
    rng = np.random.default_rng(seed)
    m = sps.random(n, n, density=density, random_state=rng, format="coo")
    m = m.tocsr()
    m.setdiag(0)
    m.eliminate_zeros()
    m = m.tocoo()
    rowsums = np.abs(m).sum(axis=1).A.ravel() if hasattr(np.abs(m).sum(axis=1), "A") \
        else np.asarray(np.abs(m).sum(axis=1)).ravel()
    diag = diag_boost * (rowsums + 1.0)
    a = sps.coo_matrix(
        (np.concatenate([m.data, diag]),
         (np.concatenate([m.row, np.arange(n)]),
          np.concatenate([m.col, np.arange(n)]))),
        shape=(n, n),
    ).tocsr()
    a.sort_indices()
    return CSRMatrix.from_scipy(a)


def random_bsr(nbrows, bs, density=0.2, diag_boost=2.0, seed=0) -> BSRMatrix:
    """Random BSR matrix with nonsingular (dominant) diagonal blocks."""
    rng = np.random.default_rng(seed)
    mask = sps.random(nbrows, nbrows, density=density, random_state=rng,
                      format="csr")
    mask.setdiag(1.0)
    mask = mask.tocoo()
    nnzb = mask.nnz
    vals = rng.standard_normal((nnzb, bs, bs))
    # strengthen diagonal blocks: blockwise dominance
    on_diag = mask.row == mask.col
    vals[on_diag] += np.eye(bs) * (diag_boost * bs * max(1.0, density * nbrows))
    rowptr = np.zeros(nbrows + 1, dtype=np.int32)
    order = np.lexsort((mask.col, mask.row))
    brow, bcol = mask.row[order], mask.col[order]
    vals = vals[order]
    np.add.at(rowptr[1:], brow, 1)
    rowptr = np.cumsum(rowptr, dtype=np.int32)
    return BSRMatrix.from_arrays(rowptr, bcol, vals, bs)


def csr_to_dense(A: CSRMatrix) -> np.ndarray:
    return A.to_scipy().toarray()


def exact_ilu0_oracle(A: CSRMatrix) -> np.ndarray:
    """Sequential IKJ ILU(0) on the CSR pattern — pure NumPy oracle matching
    the reference's single-threaded factorization (sweeps = -1)."""
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    diagind = np.asarray(A.diagind)
    ilu = np.array(np.asarray(A.vals), dtype=np.float64, copy=True)
    n = A.nrows
    for i in range(n):
        for pk in range(rowptr[i], diagind[i]):
            k = colind[pk]
            ilu[pk] /= ilu[diagind[k]]
            lik = ilu[pk]
            rowk = colind[rowptr[k]:rowptr[k + 1]]
            for pj in range(pk + 1, rowptr[i + 1]):
                j = colind[pj]
                hits = np.nonzero(rowk == j)[0]
                if hits.size:
                    p = rowptr[k] + hits[0]
                    if p >= diagind[k]:
                        ilu[pj] -= lik * ilu[p]
    return ilu


def exact_block_ilu0_oracle(B: BSRMatrix) -> np.ndarray:
    """Sequential block IKJ ILU(0): l_ik = a_ik·inv(u_kk); a_ij −= l_ik·u_kj."""
    rowptr = np.asarray(B.rowptr)
    colind = np.asarray(B.colind)
    diagind = np.asarray(B.diagind)
    ilu = np.array(np.asarray(B.vals), dtype=np.float64, copy=True)
    n = B.nbrows
    for i in range(n):
        for pk in range(rowptr[i], diagind[i]):
            k = colind[pk]
            ilu[pk] = ilu[pk] @ np.linalg.inv(ilu[diagind[k]])
            lik = ilu[pk]
            rowk = colind[rowptr[k]:rowptr[k + 1]]
            for pj in range(pk + 1, rowptr[i + 1]):
                j = colind[pj]
                hits = np.nonzero(rowk == j)[0]
                if hits.size:
                    p = rowptr[k] + hits[0]
                    if p >= diagind[k]:
                        ilu[pj] -= lik @ ilu[p]
    return ilu


def ilu0_solve_oracle(A: CSRMatrix, iluvals: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Exact LU solve with unit-lower/upper factors stored in CSR layout."""
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    diagind = np.asarray(A.diagind)
    n = A.nrows
    y = np.zeros(n)
    for i in range(n):
        s = r[i]
        for p in range(rowptr[i], diagind[i]):
            s -= iluvals[p] * y[colind[p]]
        y[i] = s
    z = np.zeros(n)
    for i in range(n - 1, -1, -1):
        s = y[i]
        for p in range(diagind[i] + 1, rowptr[i + 1]):
            s -= iluvals[p] * z[colind[p]]
        z[i] = s / iluvals[diagind[i]]
    return z


def small_coo():
    """Tiny hand-made matrix analogous to the reference's small_block3 fixtures."""
    row = np.array([0, 0, 1, 1, 1, 2, 2, 3], dtype=np.int32)
    col = np.array([0, 2, 0, 1, 3, 1, 2, 3], dtype=np.int32)
    val = np.array([4.0, -1.0, -2.0, 5.0, 1.0, -1.5, 6.0, 3.0])
    return COOMatrix(4, 4, row, col, val)
