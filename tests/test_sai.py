"""SAI/ISAI tests vs per-row least-squares oracles
(reference analogue: tests/poisson3d-fd/testsai.cpp, testtriangularsai.cpp,
testunstructuredsaipattern.cpp — pattern and solve verification)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu import AsyncSolverSettings, PrecType, create_preconditioner
from blasted_tpu.apps import poisson3d_system
from blasted_tpu.ops.spmv import spmv
from blasted_tpu.precond.sai import SAIPreconditioner
from blasted_tpu.solvers import bicgstab
from helpers import random_csr


def _sai_oracle(A, incomplete):
    """Row-wise LS oracle with numpy.lstsq (full) / solve (incomplete)."""
    sp = A.to_scipy()
    n = sp.shape[0]
    dense = sp.toarray()
    M = np.zeros_like(dense)
    for i in range(n):
        vars_ = sp.indices[sp.indptr[i]:sp.indptr[i + 1]]
        if incomplete:
            eqns = vars_
        else:
            eqns = np.unique(np.concatenate(
                [sp.indices[sp.indptr[j]:sp.indptr[j + 1]] for j in vars_]))
        lhs = dense[np.ix_(vars_, eqns)].T          # LHS[c,j] = A[j,c]
        rhs = (eqns == i).astype(float)
        if incomplete:
            m = np.linalg.solve(lhs, rhs)
        else:
            m, *_ = np.linalg.lstsq(lhs, rhs, rcond=None)
        M[i, vars_] = m
    return M


@pytest.mark.parametrize("incomplete", [False, True])
def test_sai_matches_rowwise_ls_oracle(incomplete):
    A = random_csr(40, density=0.1, seed=1)
    p = SAIPreconditioner(A.pad(), incomplete=incomplete)
    p.compute()
    Mref = _sai_oracle(A, incomplete)
    # reconstruct dense M from the padded state
    r = np.eye(40)
    M = np.stack([np.asarray(p.apply(jnp.asarray(r[i]))) for i in range(40)],
                 axis=1)  # columns are M e_i → M itself
    np.testing.assert_allclose(M, Mref, rtol=1e-8, atol=1e-8)


def test_sai_exact_for_diagonal():
    import scipy.sparse as sps
    from blasted_tpu.sparse.csr import CSRMatrix

    d = np.array([2.0, 4.0, 0.5, 8.0])
    A = CSRMatrix.from_scipy(sps.diags(d).tocsr())
    p = SAIPreconditioner(A.pad())
    p.compute()
    r = np.array([1.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(p.apply(jnp.asarray(r))), 1.0 / d,
                               rtol=1e-12)


def test_sai_reduces_residual_norm():
    """‖M A − I‖_F must beat Jacobi's ‖D⁻¹A − I‖_F (SAI is the pattern-A
    minimiser, Jacobi is a sub-pattern candidate)."""
    A = random_csr(50, density=0.1, seed=2)
    dense = A.to_scipy().toarray()
    p = SAIPreconditioner(A.pad())
    p.compute()
    M = np.stack([np.asarray(p.apply(jnp.asarray(np.eye(50)[i])))
                  for i in range(50)], axis=1)
    res_sai = np.linalg.norm(M @ dense - np.eye(50))
    res_jac = np.linalg.norm(dense / np.diag(dense)[:, None] - np.eye(50))
    assert res_sai < res_jac


@pytest.mark.parametrize("name", ["sai", "isai"])
def test_sai_preconditioned_solve(name):
    A, b, _ = poisson3d_system((8, 8, 8), dist="chebyshev")
    P = A.pad()
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType(name)))
    prec.compute()
    x, info = bicgstab(lambda v: spmv(P, v), prec.apply_flat,
                       jnp.asarray(b), jnp.zeros(A.nrows, dtype=jnp.float64),
                       tol=1e-10, maxiter=600)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-7

    # and it must converge in fewer iterations than unpreconditioned
    _, info_none = bicgstab(lambda v: spmv(P, v), lambda r: r,
                            jnp.asarray(b), jnp.zeros(A.nrows, dtype=jnp.float64),
                            tol=1e-10, maxiter=2000)
    assert int(info.iters) < int(info_none.iters)
