"""Kernel-layer tests vs dense/scipy oracles (reference analogue:
tests/mat_ops CSRMatMul/BSRMatMul golden SpMV tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu.apps import poisson3d_system
from blasted_tpu.ops import (
    bgemv3,
    bspmv,
    gemv3,
    spmv,
    block_lower_mv,
    block_upper_mv,
    lower_mv,
    upper_mv,
)
from helpers import random_bsr, random_csr


def test_spmv_vs_scipy():
    A = random_csr(100, density=0.08, seed=0)
    P = A.pad()
    x = np.random.default_rng(1).standard_normal(100)
    y = np.asarray(spmv(P, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.to_scipy() @ x, rtol=1e-13, atol=1e-13)


def test_gemv3():
    A = random_csr(50, density=0.1, seed=1)
    P = A.pad()
    rng = np.random.default_rng(2)
    x, y = rng.standard_normal(50), rng.standard_normal(50)
    z = np.asarray(gemv3(P, jnp.asarray(-1.0), jnp.asarray(x),
                         jnp.asarray(1.0), jnp.asarray(y)))
    np.testing.assert_allclose(z, -(A.to_scipy() @ x) + y, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("bs", [3, 4, 5, 7])
def test_bspmv_vs_scipy(bs):
    B = random_bsr(12, bs, seed=bs)
    P = B.pad()
    n = B.nrows
    x = np.random.default_rng(3).standard_normal(n)
    y = np.asarray(bspmv(P, jnp.asarray(x.reshape(-1, bs)))).reshape(-1)
    np.testing.assert_allclose(y, B.to_scipy() @ x, rtol=1e-12, atol=1e-12)


def test_bgemv3():
    bs = 4
    B = random_bsr(10, bs, seed=9)
    P = B.pad()
    n = B.nrows
    rng = np.random.default_rng(4)
    x, y = rng.standard_normal(n), rng.standard_normal(n)
    z = np.asarray(bgemv3(P, jnp.asarray(2.0), jnp.asarray(x.reshape(-1, bs)),
                          jnp.asarray(-0.5), jnp.asarray(y.reshape(-1, bs)))).reshape(-1)
    np.testing.assert_allclose(z, 2.0 * (B.to_scipy() @ x) - 0.5 * y,
                               rtol=1e-12, atol=1e-12)


def test_triangular_mv():
    import scipy.sparse as sps

    A = random_csr(60, density=0.1, seed=5)
    P = A.pad()
    x = np.random.default_rng(6).standard_normal(60)
    sp = A.to_scipy()
    L = sps.tril(sp, k=-1)
    U = sps.triu(sp, k=1)
    np.testing.assert_allclose(np.asarray(lower_mv(P, P.vals_pad, jnp.asarray(x))),
                               L @ x, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(upper_mv(P, P.vals_pad, jnp.asarray(x))),
                               U @ x, rtol=1e-13, atol=1e-13)


def test_block_triangular_mv():
    import scipy.sparse as sps

    bs = 3
    B = random_bsr(15, bs, seed=7)
    P = B.pad()
    n = B.nrows
    x = np.random.default_rng(8).standard_normal(n)
    dense = B.to_scipy().toarray()
    # block-triangular: zero out diagonal *blocks* and upper blocks
    Lb = dense.copy()
    Ub = dense.copy()
    for ib in range(15):
        Lb[ib * bs:(ib + 1) * bs, ib * bs:] = 0.0
        Ub[ib * bs:(ib + 1) * bs, : (ib + 1) * bs] = 0.0
    got_l = np.asarray(block_lower_mv(P, P.vals_pad, jnp.asarray(x.reshape(-1, bs)))).reshape(-1)
    got_u = np.asarray(block_upper_mv(P, P.vals_pad, jnp.asarray(x.reshape(-1, bs)))).reshape(-1)
    np.testing.assert_allclose(got_l, Lb @ x, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got_u, Ub @ x, rtol=1e-12, atol=1e-12)


def test_poisson3d_generator():
    A, b, uex = poisson3d_system((8, 8, 8), dist="uniform")
    n = 6 ** 3
    assert A.nrows == n
    sp = A.to_scipy()
    # symmetric 7-point stencil
    assert abs(sp - sp.T).max() < 1e-12
    # uniform grid on [-1,1] with 8 points: h = 2/7
    h = 2.0 / 7
    d = np.asarray(A.vals)[np.asarray(A.diagind)]
    np.testing.assert_allclose(d, 6.0 / h ** 2, rtol=1e-12)
    # SPD check via smallest eigenvalue of small problem
    w = np.linalg.eigvalsh(sp.toarray())
    assert w.min() > 0

    # Chebyshev grid: non-uniform spacing makes the FD operator nonsymmetric
    # (faithful to the reference's stencil, poisson3d_fd.cpp:84-150); it must
    # still be positive-real (eigenvalues in the right half-plane).
    A2, b2, u2 = poisson3d_system((8, 8, 8), dist="chebyshev")
    assert A2.nrows == n
    ev = np.linalg.eigvals(A2.to_scipy().toarray())
    assert ev.real.min() > 0

    # discretization converges: max error shrinks ~4x when h halves (uniform)
    errs = []
    for npts in (8, 15):  # h = 2/7 then 2/14
        Au, bu, uu = poisson3d_system((npts,) * 3, dist="uniform")
        xu = np.linalg.solve(Au.to_scipy().toarray(), bu)
        errs.append(np.abs(xu - uu).max())
    assert errs[1] < 0.35 * errs[0]


def test_dia_gemv3():
    from blasted_tpu.ops.dia import dia_gemv3
    from blasted_tpu.sparse.dia import dia_from_csr

    A, _, _ = poisson3d_system((8, 8, 8), dist="chebyshev")
    D = dia_from_csr(A)
    rng = np.random.default_rng(4)
    x, y = rng.standard_normal(D.nrows), rng.standard_normal(D.nrows)
    z = np.asarray(dia_gemv3(D, jnp.asarray(-1.0), jnp.asarray(x),
                             jnp.asarray(1.0), jnp.asarray(y)))
    np.testing.assert_allclose(z, -(D.to_scipy() @ x) + y,
                               rtol=1e-13, atol=1e-13)


def test_bdia_gemv3():
    from blasted_tpu.ops.bdia import bdia_gemv3
    from blasted_tpu.sparse.bdia import bdia_from_bsr

    B = random_bsr(16, 3, density=0.0, seed=5)  # density ignored below
    # build a genuinely banded block matrix: tri-block-diagonal
    import scipy.sparse as sps
    nb, bs = 16, 3
    rng = np.random.default_rng(6)
    blocks = {}
    for o in (-1, 0, 1):
        for i in range(max(0, -o), min(nb, nb - o)):
            blocks[(i, i + o)] = (rng.standard_normal((bs, bs)) * 0.2
                                  + (np.eye(bs) * 3 if o == 0 else 0))
    rows = np.array([k[0] for k in blocks], dtype=np.int64)
    cols = np.array([k[1] for k in blocks], dtype=np.int64)
    order = np.lexsort((cols, rows))
    from blasted_tpu.sparse import BSRMatrix
    rowptr = np.searchsorted(rows[order], np.arange(nb + 1))
    Bm = BSRMatrix.from_arrays(
        rowptr.astype(np.int32), cols[order].astype(np.int32),
        np.stack([blocks[(rows[o_], cols[o_])] for o_ in order]), bs)
    D = bdia_from_bsr(Bm)
    x = rng.standard_normal(nb * bs)
    y = rng.standard_normal(nb * bs)
    z = np.asarray(bdia_gemv3(D, jnp.asarray(2.0),
                              jnp.asarray(x.reshape(-1, bs)),
                              jnp.asarray(-1.0),
                              jnp.asarray(y.reshape(-1, bs)))).reshape(-1)
    np.testing.assert_allclose(z, 2.0 * (Bm.to_scipy() @ x) - y,
                               rtol=1e-12, atol=1e-12)


def test_invert_diag_blocks_gauss_jordan():
    """The batched Gauss-Jordan small-block inverse (ops/sweeps.py) matches
    LAPACK, including blocks that *require* pivoting (zero leading pivot)."""
    from blasted_tpu.ops.sweeps import invert_diag_blocks

    rng = np.random.default_rng(7)
    for bs in (2, 3, 4, 5, 7, 8):
        a = rng.standard_normal((64, bs, bs)) + 2.0 * np.eye(bs)
        # force a zero leading pivot in a few blocks (pivoting required)
        a[:8, 0, 0] = 0.0
        inv = np.asarray(invert_diag_blocks(jnp.asarray(a)))
        np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-9,
                                   atol=1e-10)
    # bs > 8 falls back to jnp.linalg.inv
    a = rng.standard_normal((4, 9, 9)) + 3.0 * np.eye(9)
    np.testing.assert_allclose(np.asarray(invert_diag_blocks(jnp.asarray(a))),
                               np.linalg.inv(a), rtol=1e-9, atol=1e-10)
