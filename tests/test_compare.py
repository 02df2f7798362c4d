"""Equivalence-comparator tests — the reference's testpetscsolver pattern
(testutils.cpp:66-106): same solve twice, compare by test_type.  The exact
(sequential) path plays PETSc's role as the oracle."""

import numpy as np
import pytest

from blasted_tpu.apps.compare_solvers import compare_solves, main as cli_main
from blasted_tpu.apps import poisson3d_system


def _system():
    # chebyshev spacing: on a *uniform* grid the sin-product RHS is an
    # eigenvector of the 7-point Laplacian and every Krylov method converges
    # in 1 iteration — useless for comparing preconditioners (the reference's
    # poisson.control default is chebyshev for the same reason)
    A, b, _ = poisson3d_system((10, 10, 10), dist="chebyshev")
    return A, np.asarray(b)


def _o(prec, sweeps, **kw):
    d = {"blasted_pc_type": prec, "blasted_async_sweeps": sweeps,
         "ksp_type": "bicgstab", "rtol": 1e-9, "maxiter": 500}
    d.update(kw)
    return d


def test_issame_factory_aliases():
    """'seqilu0' and 'ilu0' with sweeps −1,−1 are the same exact path via
    different factory strings (reference: solverfactory.cpp:93-107) — issame
    at the reference's 1e-13 tier must hold."""
    A, b = _system()
    res = compare_solves(A, b, _o("seqilu0", "-1,-1"), _o("ilu0", "-1,-1"),
                         test_type="issame", error_tolerance=1e-13)
    assert res.passed, res.report()
    assert res.ref_iters == res.test_iters


def test_compare_its_async_vs_exact():
    """Bounded-sweep ILU0 within 15% of the exact factorization's iteration
    count (the reference's threaded tier: error_tolerance 0.01-0.05,
    tests/CMakeLists.txt:374-424)."""
    A, b = _system()
    res = compare_solves(A, b, _o("ilu0", "-1,-1"), _o("ilu0", "6,8"),
                         test_type="compare_its", error_tolerance=0.15,
                         num_runs=2)
    assert res.passed, res.report()


def test_upper_bound_its_sgs_beats_jacobi():
    """SGS preconditioning must beat Jacobi in iterations (the reference's
    upper_bound_its tier, tests/CMakeLists.txt:365-372)."""
    A, b = _system()
    res = compare_solves(A, b, _o("jacobi", "1,1"), _o("sgs", "1,8"),
                         test_type="upper_bound_its")
    assert res.passed, res.report()
    assert res.test_iters < res.ref_iters


def test_convergence_mode_and_bad_type():
    A, b = _system()
    res = compare_solves(A, b, _o("jacobi", "1,1"), _o("jacobi", "1,1"),
                         test_type="convergence")
    assert res.passed
    with pytest.raises(ValueError):
        compare_solves(A, b, _o("jacobi", "1,1"), _o("jacobi", "1,1"),
                       test_type="nope")


def test_cli(tmp_path):
    """CLI round trip through a written MatrixMarket system."""
    from blasted_tpu.sparse import write_matrix_market
    from blasted_tpu.sparse.coo import COOMatrix

    A, b = _system()
    sp = A.to_scipy().tocoo()
    m = COOMatrix(A.nrows, A.nrows, sp.row.astype(np.int32),
                  sp.col.astype(np.int32), sp.data)
    mf = str(tmp_path / "A.mtx")
    write_matrix_market(mf, m)
    rc = cli_main(["--matrix", mf, "--test-type", "compare_its",
                   "--ref-prec", "seqilu0", "--ref-sweeps=-1,-1",
                   "--prec", "ilu0", "--sweeps", "6,8",
                   "--error-tolerance", "0.2"])
    assert rc == 0
