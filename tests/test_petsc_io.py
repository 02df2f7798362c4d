"""PETSc-binary IO tests (reference: blasted_petsc_io + util_petsc_io,
validated against the reference's own .pmat golden fixtures and the
testutils.c:60-96 read-then-check-A·x≈b pattern)."""

import os

import numpy as np
import pytest

from blasted_tpu.apps.convert_io import main as convert_main
from blasted_tpu.sparse import (
    csr_from_coo,
    petsc_block_size_hint,
    read_matrix_market,
    read_matrix_market_vector,
    read_petsc_matrix,
    read_petsc_vector,
    write_petsc_matrix,
    write_petsc_vector,
)
from blasted_tpu.sparse.coo import COOMatrix, MatrixReadError

REF = "/root/reference/tests/input/fvens-2dcyl1"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference tree not mounted")


@needs_ref
def test_pmat_matches_mtx():
    """The reference ships the same system in both formats — they must agree."""
    a_bin = csr_from_coo(read_petsc_matrix(f"{REF}/2dcyl1.pmat"))
    a_mm = csr_from_coo(read_matrix_market(f"{REF}/2dcyl1.mtx"))
    assert a_bin.nrows == a_mm.nrows
    np.testing.assert_array_equal(np.asarray(a_bin.rowptr),
                                  np.asarray(a_mm.rowptr))
    np.testing.assert_array_equal(np.asarray(a_bin.colind),
                                  np.asarray(a_mm.colind))
    np.testing.assert_allclose(np.asarray(a_bin.vals),
                               np.asarray(a_mm.vals), rtol=1e-13)


@needs_ref
def test_pvec_matches_mtx_and_residual():
    """Vec reader + the testutils.c sanity check: ‖A·x − b‖ small."""
    b_bin = read_petsc_vector(f"{REF}/2dcyl1_b.pmat")
    x_bin = read_petsc_vector(f"{REF}/2dcyl1_x.pmat")
    b_mm = read_matrix_market_vector(f"{REF}/2dcyl1_b.mtx")
    np.testing.assert_allclose(b_bin, b_mm, rtol=1e-12)
    A = csr_from_coo(read_petsc_matrix(f"{REF}/2dcyl1.pmat")).to_scipy()
    r = A @ x_bin - b_bin
    assert np.linalg.norm(r) / np.linalg.norm(b_bin) < 1e-6


@needs_ref
def test_block_size_hint():
    assert petsc_block_size_hint(f"{REF}/2dcyl1.pmat") == 4
    assert petsc_block_size_hint(f"{REF}/2dcyl1_b.pmat") is None


def test_matrix_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, nnz = 17, 60
    row = rng.integers(0, n, nnz).astype(np.int32)
    col = rng.integers(0, n, nnz).astype(np.int32)
    val = rng.standard_normal(nnz)
    m = COOMatrix(n, n, row, col, val).sum_duplicates()
    p = str(tmp_path / "m.pmat")
    write_petsc_matrix(p, m, block_size=1)
    m2 = read_petsc_matrix(p)
    np.testing.assert_array_equal(m2.row, m.row)
    np.testing.assert_array_equal(m2.col, m.col)
    np.testing.assert_allclose(m2.val, m.val, rtol=0)
    assert petsc_block_size_hint(p) == 1


def test_vector_roundtrip(tmp_path):
    v = np.linspace(-3.0, 7.0, 101)
    p = str(tmp_path / "v.pmat")
    write_petsc_vector(p, v)
    np.testing.assert_allclose(read_petsc_vector(p), v, rtol=0)


def test_bad_classid(tmp_path):
    p = str(tmp_path / "bad.pmat")
    with open(p, "wb") as f:
        np.asarray([42, 1, 1, 1], dtype=">i4").tofile(f)
    with pytest.raises(MatrixReadError):
        read_petsc_matrix(p)
    with pytest.raises(MatrixReadError):
        read_petsc_vector(p)


def test_truncated(tmp_path):
    p = str(tmp_path / "trunc.pmat")
    with open(p, "wb") as f:
        np.asarray([1211216, 4, 4, 9], dtype=">i4").tofile(f)
        np.asarray([3, 3, 3], dtype=">i4").tofile(f)  # only 3 of 4 row lens
    with pytest.raises(MatrixReadError):
        read_petsc_matrix(p)


@needs_ref
def test_converter_cli(tmp_path):
    """util_petsc_io equivalence: mtx -> pmat must byte-match PETSc's own
    output for the same system (modulo the .info side file)."""
    import shutil
    mtx = str(tmp_path / "2dcyl1.mtx")
    bm = str(tmp_path / "b.mtx")
    shutil.copy(f"{REF}/2dcyl1.mtx", mtx)
    shutil.copy(f"{REF}/2dcyl1_b.mtx", bm)
    assert convert_main([mtx, bm, "--block-size", "4"]) == 0
    ours = read_petsc_matrix(mtx + ".pmat")
    theirs = read_petsc_matrix(f"{REF}/2dcyl1.pmat")
    np.testing.assert_array_equal(ours.row, theirs.row)
    np.testing.assert_array_equal(ours.col, theirs.col)
    # exact except for the sign of zeros (-0.0 entries in the source mtx
    # are normalised to +0.0 by duplicate summation); == treats them equal
    assert bool(np.all(ours.val == theirs.val))
    np.testing.assert_allclose(read_petsc_vector(bm + ".pmat"),
                               read_petsc_vector(f"{REF}/2dcyl1_b.pmat"),
                               rtol=1e-12)
