"""Block-DIA format-parity tests (block analogue of test_dia.py): every
block kernel and the block-ILU(0) must match the padded-BSR path and the
sequential block oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu import AsyncSolverSettings, PrecType, SEQUENTIAL, create_preconditioner
from blasted_tpu.apps.poisson3d import poisson3d_csr, CartMesh
from blasted_tpu.factory import to_device_matrix
from blasted_tpu.ops.spmv import bspmv
from blasted_tpu.precond.bdia_ilu0 import BlockDiaILU0Preconditioner
from blasted_tpu.precond.ilu0 import BlockILU0Preconditioner
from blasted_tpu.solvers import bicgstab
from blasted_tpu.sparse.bdia import BlockDiaMatrix, bdia_from_bsr, try_bdia_from_bsr
from blasted_tpu.sparse.bsr import BSRMatrix
from helpers import exact_block_ilu0_oracle


def block_poisson_bsr(nx=5, bs=4, seed=0) -> BSRMatrix:
    """Structured-grid block matrix: Poisson 7-pt block pattern with random
    blocks and dominant block diagonal (the CFD-Jacobian analogue)."""
    mesh = CartMesh.uniform((nx + 2,) * 3)
    A = poisson3d_csr(mesh)
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    nnzb = colind.shape[0]
    rng = np.random.default_rng(seed)
    vals = rng.standard_normal((nnzb, bs, bs)) * 0.3
    rows = np.repeat(np.arange(nx ** 3), np.diff(rowptr))
    on_diag = colind == rows
    vals[on_diag] += np.eye(bs) * 8.0
    return BSRMatrix.from_arrays(rowptr, colind, vals, bs)


@pytest.fixture(scope="module")
def bmat():
    return block_poisson_bsr()


def test_bdia_roundtrip(bmat):
    D = bdia_from_bsr(bmat)
    np.testing.assert_allclose(D.to_scipy().toarray(),
                               bmat.to_scipy().toarray())
    assert try_bdia_from_bsr(bmat) is not None


def test_bdia_spmv_matches_bsr(bmat):
    D = bdia_from_bsr(bmat)
    P = bmat.pad()
    x = np.random.default_rng(1).standard_normal(bmat.nrows).reshape(-1, bmat.bs)
    np.testing.assert_allclose(np.asarray(bspmv(D, jnp.asarray(x))),
                               np.asarray(bspmv(P, jnp.asarray(x))),
                               rtol=1e-12, atol=1e-12)


def test_bdia_exact_ilu0_matches_oracle(bmat):
    D = bdia_from_bsr(bmat)
    p = BlockDiaILU0Preconditioner(D, nbuildsweeps=SEQUENTIAL,
                                   napplysweeps=SEQUENTIAL)
    p.compute()
    ref = exact_block_ilu0_oracle(bmat)
    ref_d = np.asarray(bdia_from_bsr(bmat.with_vals(jnp.asarray(ref))).data)
    np.testing.assert_allclose(np.asarray(p.state.ilu), ref_d,
                               rtol=1e-10, atol=1e-11)


def test_bdia_ilu0_sweeps_match_bsr(bmat):
    D = bdia_from_bsr(bmat)
    P = bmat.pad()
    for ns in (1, 3):
        pd = BlockDiaILU0Preconditioner(D, nbuildsweeps=ns, napplysweeps=2)
        pd.compute()
        pc = BlockILU0Preconditioner(P, nbuildsweeps=ns, napplysweeps=2)
        pc.compute()
        ref_d = np.asarray(bdia_from_bsr(bmat.with_vals(pc.state.ilu)).data)
        np.testing.assert_allclose(np.asarray(pd.state.ilu), ref_d,
                                   rtol=1e-11, atol=1e-12)
        r = np.random.default_rng(ns).standard_normal(bmat.nrows)
        r = r.reshape(-1, bmat.bs)
        np.testing.assert_allclose(np.asarray(pd.apply(jnp.asarray(r))),
                                   np.asarray(pc.apply(jnp.asarray(r))),
                                   rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("name", ["jacobi", "sgs", "gs", "level_sgs"])
def test_bdia_other_precs_match_bsr(bmat, name):
    D = bdia_from_bsr(bmat)
    P = bmat.pad()
    settings = AsyncSolverSettings(prec_type=PrecType(name),
                                   nbuildsweeps=3, napplysweeps=3)
    pd = create_preconditioner(D, settings)
    pd.compute()
    pc = create_preconditioner(P, settings)
    pc.compute()
    r = np.random.default_rng(3).standard_normal(bmat.nrows).reshape(-1, bmat.bs)
    np.testing.assert_allclose(np.asarray(pd.apply(jnp.asarray(r))),
                               np.asarray(pc.apply(jnp.asarray(r))),
                               rtol=1e-10, atol=1e-10)


def test_bdia_scaled_ilu0_matches_bsr(bmat):
    D = bdia_from_bsr(bmat)
    P = bmat.pad()
    pd = BlockDiaILU0Preconditioner(D, nbuildsweeps=4, napplysweeps=3,
                                    use_scaling=True)
    pd.compute()
    pc = BlockILU0Preconditioner(P, nbuildsweeps=4, napplysweeps=3,
                                 use_scaling=True)
    pc.compute()
    r = np.random.default_rng(7).standard_normal(bmat.nrows).reshape(-1, bmat.bs)
    np.testing.assert_allclose(np.asarray(pd.apply(jnp.asarray(r))),
                               np.asarray(pc.apply(jnp.asarray(r))),
                               rtol=1e-10, atol=1e-10)


def test_bdia_end_to_end_solve(bmat):
    D = to_device_matrix(bmat)
    assert isinstance(D, BlockDiaMatrix)
    bs = bmat.bs
    n = bmat.nrows
    rng = np.random.default_rng(9)
    xref = rng.standard_normal(n)
    b = bmat.to_scipy() @ xref
    prec = create_preconditioner(
        D, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=SEQUENTIAL,
                               napplysweeps=SEQUENTIAL))
    prec.compute()

    def amat(x):
        return bspmv(D, x.reshape(-1, bs)).reshape(-1)

    x, info = bicgstab(amat, prec.apply_flat, jnp.asarray(b),
                       jnp.zeros(n, dtype=jnp.float64), tol=1e-12, maxiter=300)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-9


def test_bdia_compressed_sweeps_characterisation(bmat):
    """Compressed substituted block sweeps vs the plain SoA chain: after K
    compressed sweeps the block diagonal equals the plain chain at 2K and
    the lowers equal it at 2K−1 (same contraction law as the scalar
    stencil factor, test_stencil.py); uppers pass through."""
    from blasted_tpu.precond.bdia_ilu0 import (
        bdia_factor_sweeps_compressed,
        bdia_factor_sweeps_soa,
    )
    from blasted_tpu.precond.dia_ilu0 import dia_pairs

    D = bdia_from_bsr(bmat)
    offsets = D.offsets
    pairs = dia_pairs(offsets)
    d0 = offsets.index(0)
    K = 2
    comp = bdia_factor_sweeps_compressed(offsets, pairs, d0, D.mask,
                                         D.data, D.data, K)
    ref = {s: bdia_factor_sweeps_soa(offsets, pairs, d0, D.mask,
                                     D.data, D.data, s)
           for s in (2 * K - 1, 2 * K)}
    for d, o in enumerate(offsets):
        want = ref[2 * K][d] if o >= 0 else ref[2 * K - 1][d]
        for c in range(len(want)):
            np.testing.assert_allclose(np.asarray(comp[d][c]),
                                       np.asarray(want[c]),
                                       rtol=1e-11, atol=1e-12)
