"""Reordering/scaling tests (reference analogue: tests/mat_ops reordering
apply/invert tests on vectors and matrices, MC64 jobs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu.apps import poisson3d_system
from blasted_tpu.ops.spmv import spmv
from blasted_tpu.precond.reordering import (
    COLUMN,
    FORWARD,
    INVERSE,
    MaxDiagonalScaling,
    RCMReordering,
    Reordering,
    ReorderedILU0Preconditioner,
    ROW,
    apply_ordering_matrix,
    apply_ordering_vector,
)
from blasted_tpu.solvers import bicgstab
from helpers import random_bsr, random_csr


def test_vector_ordering_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.standard_normal(12)
    p = rng.permutation(12)
    f = apply_ordering_vector(v, p, FORWARD)
    np.testing.assert_allclose(f, v[p])
    back = apply_ordering_vector(f, p, INVERSE)
    np.testing.assert_allclose(back, v)
    # block segments move as units
    vb = rng.standard_normal(12)
    pb = rng.permutation(4)
    fb = apply_ordering_vector(vb, pb, FORWARD, bs=3)
    np.testing.assert_allclose(fb.reshape(4, 3), vb.reshape(4, 3)[pb])


def test_matrix_ordering_consistency():
    """Ã x̃ = (A x)~ : permuted operator on permuted vectors equals permuted
    product — validates the row/col conventions."""
    A = random_csr(25, density=0.15, seed=1)
    rng = np.random.default_rng(1)
    p = rng.permutation(25)
    r = Reordering()
    r.set_ordering(p, p)
    At = r.apply_to_matrix(A, FORWARD)
    x = rng.standard_normal(25)
    xt = apply_ordering_vector(x, p, FORWARD)
    yt = At.to_scipy() @ xt
    y = A.to_scipy() @ x
    np.testing.assert_allclose(yt, y[p], rtol=1e-13)
    # inverse undoes forward
    back = r.apply_to_matrix(At, INVERSE)
    np.testing.assert_allclose(back.to_scipy().toarray(),
                               A.to_scipy().toarray())


def test_matrix_ordering_bsr():
    B = random_bsr(8, 3, density=0.3, seed=2)
    p = np.random.default_rng(2).permutation(8)
    r = Reordering()
    r.set_ordering(p, p)
    Bt = apply_ordering_matrix(B, p, p, FORWARD)
    dense = B.to_scipy().toarray()
    # block-permute dense oracle
    idx = np.concatenate([np.arange(pi * 3, pi * 3 + 3) for pi in p])
    np.testing.assert_allclose(Bt.to_scipy().toarray(), dense[np.ix_(idx, idx)])


def test_rcm_reduces_bandwidth():
    A = random_csr(60, density=0.06, seed=3)
    # symmetrise the pattern for RCM
    sp = A.to_scipy()
    sp = sp + sp.T
    from blasted_tpu.sparse.csr import CSRMatrix
    As = CSRMatrix.from_scipy(sp.tocsr())
    r = RCMReordering()
    r.compute(As)
    At = r.apply_to_matrix(As, FORWARD)

    def bandwidth(m):
        mm = m.to_scipy().tocoo()
        return int(np.abs(mm.row - mm.col).max())

    assert bandwidth(At) <= bandwidth(As)


def test_reordered_ilu0_solves():
    """RCM-reordered ILU0 preconditioner drives BiCGSTAB to the right answer."""
    A, b, _ = poisson3d_system((8, 8, 8), dist="chebyshev")
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    from blasted_tpu import AsyncSolverSettings, PrecType

    prec = ReorderedILU0Preconditioner(
        A, RCMReordering(),
        AsyncSolverSettings(prec_type=PrecType.ILU0,
                            nbuildsweeps=4, napplysweeps=4),
        prefer_dia=False)
    prec.compute()
    P = A.pad()
    x, info = bicgstab(lambda v: spmv(P, v), prec.apply_flat,
                       jnp.asarray(b), jnp.zeros(A.nrows, dtype=jnp.float64),
                       tol=1e-10, maxiter=600)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-7


def test_max_diagonal_scaling():
    A = random_csr(30, density=0.15, seed=4)
    s = MaxDiagonalScaling()
    s.compute(A)
    As = s.apply_scaling_matrix(A)
    d = np.abs(np.asarray(As.vals)[np.asarray(As.diagind)])
    np.testing.assert_allclose(d, 1.0, rtol=1e-12)


def test_max_product_matching_permutation():
    """MC64-style max-product row matching: after permutation the diagonal
    has no zeros and the log-product of |diagonal| is maximised vs identity
    (reference analogue: MC64 job tests, tests/mat_ops)."""
    import scipy.sparse as sps
    from blasted_tpu.sparse.csr import CSRMatrix

    rng = np.random.default_rng(11)
    n = 20
    # matrix with a weak diagonal but strong off-diagonal structure
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3)
    # ensure structural full rank via a shifted strong band
    for i in range(n):
        dense[i, (i + 3) % n] = 5.0 + rng.random()
        dense[i, i] += 0.1
    A = CSRMatrix.from_scipy(sps.csr_matrix(dense))
    s = MaxDiagonalScaling(permute=True)
    s.compute(A)
    assert s.rp is not None
    At = s.apply_to_matrix(A, FORWARD)
    d_after = np.abs(np.asarray(At.to_scipy().diagonal()))
    d_before = np.abs(dense.diagonal())
    assert d_after.min() > 0
    assert np.sum(np.log(d_after)) > np.sum(np.log(np.abs(d_before) + 1e-300))


@pytest.mark.parametrize("job", [1, 2, 3, 4, 5])
def test_max_matching_jobs(job):
    """MC64-job analogue (reference: tests/mat_ops/testmc64.cpp): the job's
    diagonal quality metric must not degrade under the FORWARD permutation,
    and INVERSE must restore the original matrix exactly."""
    import scipy.sparse as sps

    from blasted_tpu.precond.reordering import MaxMatchingReordering
    from blasted_tpu.sparse.csr import CSRMatrix

    rng = np.random.default_rng(13)
    n = 40
    # weak / partially-zero diagonal hidden behind strong shifted structure
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.25)
    for i in range(n):
        dense[i, (i + 7) % n] = 10.0 + rng.random()
        if i % 3 == 0:
            dense[i, i] = 0.0       # some zero diagonals to repair
        else:
            dense[i, i] = 0.01 * rng.random()
    # keep the diagonal *structurally* present (explicit zeros): the CSR
    # container requires a stored diagonal position in every row.  (COO
    # duplicate-summing keeps zero-valued positions; csr addition prunes.)
    base = sps.csr_matrix(dense).tocoo()
    rows = np.concatenate([base.row, np.arange(n)])
    cols = np.concatenate([base.col, np.arange(n)])
    data = np.concatenate([base.data, np.zeros(n)])
    spm = sps.csr_matrix((data, (rows, cols)), shape=(n, n))
    spm.sort_indices()
    A = CSRMatrix.from_scipy(spm)

    def metric(M):
        d = np.asarray(M.to_scipy().diagonal())
        if job == 1:
            return np.count_nonzero(d)
        if job in (2, 3):
            return np.abs(d).min()
        if job == 4:
            return np.abs(d).sum()
        return np.log(np.abs(d) + 1e-300).sum()   # log-product (job 5)

    r = MaxMatchingReordering(job)
    r.compute(A)
    At = r.apply_to_matrix(A, FORWARD)
    assert metric(At) >= metric(A)
    if job in (1, 2, 3):
        # the matched diagonal must be structurally full
        assert np.count_nonzero(np.asarray(At.to_scipy().diagonal())) == 40

    # round-trip (reference asserts the 5-way isEqual after INVERSE)
    back = r.apply_to_matrix(At, INVERSE)
    ok = A.is_equal(back, 1e-15)
    assert all(bool(v) for v in ok)

    if job == 5:
        assert r.row_scale is not None
        # scalings equilibrate the permuted diagonal to exactly 1
        import scipy.sparse as sp2
        S = sp2.diags(r.row_scale)
        scaled = (S @ At.to_scipy() @ sp2.diags(r.col_scale)).tocsr()
        d = np.abs(scaled.diagonal())
        nzd = d[d > 0]
        np.testing.assert_allclose(nzd, 1.0, rtol=1e-10)


def test_max_matching_invalid_job():
    from blasted_tpu.precond.reordering import MaxMatchingReordering

    with pytest.raises(ValueError):
        MaxMatchingReordering(0)
