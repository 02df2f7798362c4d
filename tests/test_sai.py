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


def _block_sai_oracle(B, incomplete):
    """Per-block-row LS oracle: min ‖ LHS·Y − E ‖ with LHS[c,j] = A_jcᵀ,
    M_ij = Y_jᵀ."""
    import numpy as np

    bs = B.bs
    nb = B.nbrows
    rowptr = np.asarray(B.rowptr)
    colind = np.asarray(B.colind)
    vals = np.asarray(B.vals)
    dense = B.to_scipy().toarray()
    M = np.zeros_like(dense)
    import scipy.sparse as sps
    patt = sps.csr_matrix((np.ones(colind.shape[0]), colind, rowptr),
                          shape=(nb, nb))
    for i in range(nb):
        vars_ = colind[rowptr[i]:rowptr[i + 1]]
        if incomplete:
            eqns = vars_
        else:
            eqns = np.unique(np.concatenate(
                [colind[rowptr[j]:rowptr[j + 1]] for j in vars_]))
        lhs = np.zeros((len(eqns) * bs, len(vars_) * bs))
        for vj, j in enumerate(vars_):
            for ce, c in enumerate(eqns):
                blkv = dense[j * bs:(j + 1) * bs, c * bs:(c + 1) * bs]
                lhs[ce * bs:(ce + 1) * bs, vj * bs:(vj + 1) * bs] = blkv.T
        rhs = np.zeros((len(eqns) * bs, bs))
        ci = int(np.nonzero(eqns == i)[0][0])
        rhs[ci * bs:(ci + 1) * bs] = np.eye(bs)
        if incomplete:
            Y = np.linalg.solve(lhs, rhs)
        else:
            Y, *_ = np.linalg.lstsq(lhs, rhs, rcond=None)
        for vj, j in enumerate(vars_):
            M[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = \
                Y[vj * bs:(vj + 1) * bs].T
    return M


@pytest.mark.parametrize("incomplete", [False, True])
def test_block_sai_matches_oracle(incomplete):
    from blasted_tpu.precond.sai import BlockSAIPreconditioner
    from helpers import random_bsr

    B = random_bsr(10, 3, density=0.25, seed=5)
    p = BlockSAIPreconditioner(B.pad(), incomplete=incomplete)
    p.compute()
    Mref = _block_sai_oracle(B, incomplete)
    n = B.nrows
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(np.asarray(p.apply(jnp.asarray(e.reshape(-1, 3)))).reshape(-1))
    M = np.stack(cols, axis=1)
    np.testing.assert_allclose(M, Mref, rtol=1e-7, atol=1e-8)


def test_block_sai_preconditioned_solve():
    from blasted_tpu.ops.spmv import bspmv
    from helpers import random_bsr

    B = random_bsr(20, 4, density=0.15, seed=6)
    Pb = B.pad()
    n = B.nrows
    rng = np.random.default_rng(6)
    xref = rng.standard_normal(n)
    b = B.to_scipy() @ xref
    prec = create_preconditioner(
        Pb, AsyncSolverSettings(prec_type=PrecType.SAI))
    prec.compute()

    def amat(x):
        return bspmv(Pb, x.reshape(-1, 4)).reshape(-1)

    x, info = bicgstab(amat, prec.apply_flat, jnp.asarray(b),
                       jnp.zeros(n, dtype=jnp.float64), tol=1e-11,
                       maxiter=400)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-8
