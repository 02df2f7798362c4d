"""Storage-layer unit tests (reference analogue: tests/mat_ops/ —
COO read, COO→CSR/BSR conversion vs golden outputs, BSR→BSC, adjacency)."""

import numpy as np
import pytest
import scipy.sparse as sps

from blasted_tpu.sparse import (
    BSRMatrix,
    CSRMatrix,
    bsr_from_coo,
    bsr_to_csc,
    column_adjacency,
    csr_from_bsr,
    csr_from_coo,
    read_matrix_market,
    read_matrix_market_vector,
    scaling_vector,
    write_matrix_market,
)
from helpers import random_bsr, random_csr, small_coo


def test_coo_to_csr_matches_scipy():
    coo = small_coo()
    A = csr_from_coo(coo)
    ref = sps.coo_matrix((coo.val, (coo.row, coo.col)), shape=(4, 4)).toarray()
    np.testing.assert_allclose(A.to_scipy().toarray(), ref)
    # diagind points at the diagonal
    vals = np.asarray(A.vals)
    np.testing.assert_allclose(vals[np.asarray(A.diagind)], np.diag(ref))


def test_matrix_market_roundtrip(tmp_path):
    coo = small_coo()
    path = str(tmp_path / "m.mtx")
    write_matrix_market(path, coo)
    back = read_matrix_market(path)
    A1 = csr_from_coo(coo).to_scipy().toarray()
    A2 = csr_from_coo(back).to_scipy().toarray()
    np.testing.assert_allclose(A1, A2)


def test_matrix_market_symmetric(tmp_path):
    path = str(tmp_path / "sym.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% a comment\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n2 2 2.0\n3 3 1.0\n")
    m = read_matrix_market(path)
    A = csr_from_coo(m).to_scipy().toarray()
    ref = np.array([[2.0, -1.0, 0], [-1.0, 2.0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(A, ref)


def test_mm_vector(tmp_path):
    path = str(tmp_path / "v.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n")
        f.write("3 1\n1.5\n-2\n0.25\n")
    v = read_matrix_market_vector(path)
    np.testing.assert_allclose(v, [1.5, -2.0, 0.25])


@pytest.mark.parametrize("bs", [2, 3, 4, 5, 7])
def test_coo_to_bsr_matches_scipy(bs):
    n = 8 * bs
    rng = np.random.default_rng(3)
    dense = np.zeros((n, n))
    # random block pattern with full block diagonal
    for ib in range(8):
        for jb in range(8):
            if ib == jb or rng.random() < 0.3:
                dense[ib * bs:(ib + 1) * bs, jb * bs:(jb + 1) * bs] = \
                    rng.standard_normal((bs, bs))
    coo_sp = sps.coo_matrix(dense)
    from blasted_tpu.sparse.coo import COOMatrix
    coo = COOMatrix(n, n, coo_sp.row.astype(np.int32),
                    coo_sp.col.astype(np.int32), coo_sp.data)
    B = bsr_from_coo(coo, bs)
    np.testing.assert_allclose(B.to_scipy().toarray(), dense)
    # block diagind correctness
    vals = np.asarray(B.vals)
    for ib in range(8):
        np.testing.assert_allclose(
            vals[np.asarray(B.diagind)[ib]],
            dense[ib * bs:(ib + 1) * bs, ib * bs:(ib + 1) * bs])


def test_csr_from_bsr_expansion():
    B = random_bsr(6, 3, seed=1)
    A = csr_from_bsr(B)
    np.testing.assert_allclose(A.to_scipy().toarray(), B.to_scipy().toarray())


def test_bsr_to_csc_roundtrip():
    A = random_csr(30, density=0.15, seed=2)
    csc = bsr_to_csc(np.asarray(A.rowptr), np.asarray(A.colind), np.asarray(A.vals))
    ref = A.to_scipy().tocsc()
    np.testing.assert_array_equal(csc.colptr, ref.indptr)
    np.testing.assert_array_equal(csc.rowind, ref.indices)
    np.testing.assert_allclose(csc.vals, ref.data)
    # diagind points at diagonal entries
    for j in range(30):
        assert csc.rowind[csc.diagind[j]] == j


def test_column_adjacency():
    A = random_csr(20, density=0.2, seed=4)
    colptr, rowind, locs = column_adjacency(np.asarray(A.rowptr), np.asarray(A.colind))
    colind = np.asarray(A.colind)
    vals = np.asarray(A.vals)
    # each recorded location must hold an entry in that column
    for j in range(20):
        for p in range(colptr[j], colptr[j + 1]):
            assert colind[locs[p]] == j


def test_scaling_vector_scalar_and_block():
    A = random_csr(25, seed=5)
    s = scaling_vector(A)
    d = np.asarray(A.vals)[np.asarray(A.diagind)]
    np.testing.assert_allclose(s, 1.0 / np.sqrt(d))

    B = random_bsr(5, 4, seed=6)
    sb = scaling_vector(B)
    dense = B.to_scipy().toarray()
    np.testing.assert_allclose(sb, 1.0 / np.sqrt(np.diag(dense)))


def test_padded_csr_structure():
    A = random_csr(40, density=0.1, seed=7)
    P = A.pad()
    n = A.nrows
    pos = np.asarray(P.pos)
    cols = np.asarray(P.colind)
    rowptr = np.asarray(A.rowptr)
    rownnz = np.diff(rowptr)
    assert P.width == rownnz.max()
    # sentinel padding beyond row nnz
    for i in range(n):
        np.testing.assert_array_equal(
            pos[i, : rownnz[i]], np.arange(rowptr[i], rowptr[i + 1]))
        assert np.all(pos[i, rownnz[i]:] == A.nnz)
        assert np.all(cols[i, rownnz[i]:] == n)
    # masks partition off-diagonal entries
    lower = np.asarray(P.lower_mask)
    upper = np.asarray(P.upper_mask)
    rows = np.arange(n)[:, None]
    np.testing.assert_array_equal(lower, (cols < rows))
    np.testing.assert_array_equal(upper, (cols > rows) & (cols < n))


def test_padded_repad_vals():
    A = random_csr(15, density=0.2, seed=8)
    P = A.pad()
    new_vals = np.asarray(A.vals) * 3.0
    vp = np.asarray(P.repad_vals(new_vals))
    np.testing.assert_allclose(vp, np.asarray(P.vals_pad) * 3.0)


def test_diagnostic_queries_csr():
    """Container diagnostics (reference: blockmatrices.hpp:419-445 —
    zeroDiagonalRow, getNumZeroDiagonals, getDiagonalProduct,
    getDiagonalAbsSum, getAbsMin/MaxDiagonalEntry, isEqual)."""
    A = random_csr(25, density=0.2, seed=11)
    d = np.asarray(A.vals)[np.asarray(A.diagind)]
    assert A.zero_diagonal_row() == -1
    assert A.num_zero_diagonals() == 0
    np.testing.assert_allclose(A.diagonal_product(), d.prod())
    np.testing.assert_allclose(A.diagonal_abs_sum(), np.abs(d).sum())
    np.testing.assert_allclose(A.abs_min_diagonal(), np.abs(d).min())
    np.testing.assert_allclose(A.abs_max_diagonal(), np.abs(d).max())
    # plant a zero diagonal
    v = np.asarray(A.vals).copy()
    v[np.asarray(A.diagind)[7]] = 0.0
    Z = A.with_vals(v)
    assert Z.zero_diagonal_row() == 7
    assert Z.num_zero_diagonals() == 1

    assert A.is_equal(A, 0.0) == (True,) * 5
    B = A.with_vals(np.asarray(A.vals) + 1e-12)
    n, rp, ci, vals_eq, di = A.is_equal(B, 1e-10)
    assert (n, rp, ci, vals_eq, di) == (True,) * 5
    n, rp, ci, vals_eq, di = A.is_equal(B, 1e-14)
    assert (n, rp, ci, di) == (True,) * 4 and not vals_eq


def test_diagnostic_queries_bsr():
    B = random_bsr(10, 3, density=0.3, seed=12)
    d = np.diagonal(np.asarray(B.vals)[np.asarray(B.diagind)],
                    axis1=-2, axis2=-1).reshape(-1)
    assert B.diag_entries().shape == (30,)
    np.testing.assert_allclose(B.diagonal_abs_sum(), np.abs(d).sum())
    assert B.is_equal(B, 0.0) == (True,) * 5
