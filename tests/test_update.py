"""Value-update workflow tests (the PCSetUp-every-Newton-step pattern).

The reference's integration story is: PETSc re-assembles the Jacobian
(submitBlock/updateBlock/updateDiagBlock/scaleAll, blockmatrices.hpp:283-344),
then ``compute()`` re-factorizes in place over cached symbolic data every
PCSetUp (blasted_petsc.cpp:314-327, solverops_ilu0.cpp:190-201).  These tests
assert (a) the assembly entry points match scipy oracles, (b) pushing new
values through an existing preconditioner and recomputing matches a
freshly-built preconditioner bitwise, with the symbolic arrays reused.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu.config import SEQUENTIAL, AsyncSolverSettings, PrecType
from blasted_tpu.factory import create_preconditioner, to_device_matrix
from blasted_tpu.precond.bdia_ilu0 import BlockDiaILU0Preconditioner
from blasted_tpu.precond.dia_ilu0 import DiaILU0Preconditioner
from blasted_tpu.precond.ilu0 import BlockILU0Preconditioner, ILU0Preconditioner
from blasted_tpu.precond.sai import SAIPreconditioner
from blasted_tpu.sparse.bdia import bdia_from_bsr
from blasted_tpu.sparse.dia import dia_from_csr

from helpers import random_bsr, random_csr


# ----------------------------------------------------------- assembly ops ----

def test_csr_update_and_submit_entries():
    A = random_csr(40, density=0.1, seed=3)
    sp = A.to_scipy()
    rows = np.array([0, 5, 5, 17])
    cols = np.asarray(A.colind)[np.asarray(A.rowptr)[rows]]  # first entry/row
    vals = np.array([1.5, -2.0, 3.0, 0.25])

    B = A.update_entries(rows, cols, vals)          # scatter-ADD, dups accumulate
    ref = sp.copy()
    for r, c, v in zip(rows, cols, vals):
        ref[r, c] += v
    np.testing.assert_allclose(B.to_scipy().toarray(), ref.toarray())

    C = A.submit_entries(rows[:2], cols[:2], vals[:2])   # overwrite
    ref2 = sp.copy()
    for r, c, v in zip(rows[:2], cols[:2], vals[:2]):
        ref2[r, c] = v
    np.testing.assert_allclose(C.to_scipy().toarray(), ref2.toarray())

    D = A.update_diag_entries([2, 9], [10.0, -1.0])
    ref3 = sp.copy()
    ref3[2, 2] += 10.0
    ref3[9, 9] += -1.0
    np.testing.assert_allclose(D.to_scipy().toarray(), ref3.toarray())

    E = A.scale_all(0.5)
    np.testing.assert_allclose(E.to_scipy().toarray(), 0.5 * sp.toarray())

    # out-of-pattern entries must raise (reference asserts in updateBlock)
    row0_cols = set(np.asarray(A.colind)[np.asarray(A.rowptr)[0]:
                                         np.asarray(A.rowptr)[1]].tolist())
    missing = next(c for c in range(40) if c not in row0_cols)
    with pytest.raises(ValueError):
        A.update_entries([0], [missing], [1.0])


def test_bsr_update_and_submit_blocks():
    B = random_bsr(12, 3, density=0.3, seed=7)
    dense = B.to_scipy().toarray()
    brows = np.array([1, 4])
    bcols = np.asarray(B.colind)[np.asarray(B.diagind)[brows]]  # diagonal blocks
    blocks = np.arange(2 * 9, dtype=float).reshape(2, 3, 3)

    C = B.update_blocks(brows, bcols, blocks)
    ref = dense.copy()
    for k, (i, j) in enumerate(zip(brows, bcols)):
        ref[3 * i:3 * i + 3, 3 * j:3 * j + 3] += blocks[k]
    np.testing.assert_allclose(C.to_scipy().toarray(), ref)

    D = B.submit_blocks(brows, bcols, blocks)
    ref2 = dense.copy()
    for k, (i, j) in enumerate(zip(brows, bcols)):
        ref2[3 * i:3 * i + 3, 3 * j:3 * j + 3] = blocks[k]
    np.testing.assert_allclose(D.to_scipy().toarray(), ref2)

    E = B.update_diag_blocks(brows, blocks)
    np.testing.assert_allclose(E.to_scipy().toarray(), ref)  # same diag blocks

    F = B.scale_all(2.0)
    np.testing.assert_allclose(F.to_scipy().toarray(), 2.0 * dense)


def test_padded_flat_vals_roundtrip():
    A = random_csr(30, density=0.15, seed=5)
    P = A.pad()
    np.testing.assert_array_equal(np.asarray(P.flat_vals()),
                                  np.asarray(A.vals))
    B = random_bsr(10, 4, density=0.4, seed=5)
    PB = B.pad()
    np.testing.assert_array_equal(np.asarray(PB.flat_vals()),
                                  np.asarray(B.vals))


# --------------------------------------------- update → recompute == fresh ----

def _perturbed_vals(vals, seed=99, scale=0.05):
    rng = np.random.default_rng(seed)
    v = np.asarray(vals)
    return v * (1.0 + scale * rng.standard_normal(v.shape))


@pytest.mark.parametrize("sweeps", [3, SEQUENTIAL])
def test_ilu0_csr_update_values_bitwise(sweeps):
    A = random_csr(60, density=0.08, seed=11)
    P = A.pad()
    p = ILU0Preconditioner(P, nbuildsweeps=sweeps, napplysweeps=2)
    p.compute()
    sym_before = p.symbolic
    r = jnp.asarray(np.random.default_rng(0).standard_normal(60))
    _ = p.apply(r)

    new_vals = _perturbed_vals(A.vals)
    p.update_values(new_vals)
    p.compute()
    assert p.symbolic is sym_before       # symbolic reused, not rebuilt

    fresh = ILU0Preconditioner(A.with_vals(jnp.asarray(new_vals)).pad(),
                               nbuildsweeps=sweeps, napplysweeps=2)
    fresh.compute()
    np.testing.assert_array_equal(np.asarray(p.state.ilu),
                                  np.asarray(fresh.state.ilu))
    np.testing.assert_array_equal(np.asarray(p.apply(r)),
                                  np.asarray(fresh.apply(r)))


def test_block_ilu0_update_values_bitwise():
    B = random_bsr(20, 4, density=0.2, seed=13)
    p = BlockILU0Preconditioner(B.pad(), nbuildsweeps=4, napplysweeps=2)
    p.compute()
    sym_before = p.symbolic

    new_vals = _perturbed_vals(B.vals)
    p.update_values(new_vals)
    p.compute()
    assert p.symbolic is sym_before

    fresh = BlockILU0Preconditioner(
        B.with_vals(jnp.asarray(new_vals)).pad(), nbuildsweeps=4,
        napplysweeps=2)
    fresh.compute()
    np.testing.assert_array_equal(np.asarray(p.state.ilu),
                                  np.asarray(fresh.state.ilu))


def _banded_csr(n=48, seed=2):
    import scipy.sparse as sps
    rng = np.random.default_rng(seed)
    diags = [rng.standard_normal(n) for _ in range(5)]
    offs = [-4, -1, 0, 1, 4]
    sp = sps.diags(diags, offs, shape=(n, n), format="csr")
    sp.setdiag(6.0 + np.abs(sp.diagonal()))
    from blasted_tpu.sparse.csr import CSRMatrix
    return CSRMatrix.from_scipy(sp)


def test_dia_ilu0_update_values_bitwise():
    A = _banded_csr()
    D = dia_from_csr(A)
    p = DiaILU0Preconditioner(D, nbuildsweeps=4, napplysweeps=2)
    p.compute()
    levels_before = p._levels

    new_data = np.asarray(D.data) * 1.1
    p.update_values(new_data)
    p.compute()
    assert p._levels is levels_before     # level cache reused

    fresh = DiaILU0Preconditioner(D.with_new_data(jnp.asarray(new_data)),
                                  nbuildsweeps=4, napplysweeps=2)
    fresh.compute()
    np.testing.assert_array_equal(np.asarray(p.state.ilu),
                                  np.asarray(fresh.state.ilu))


def test_bdia_ilu0_update_values_bitwise():
    B = random_bsr(16, 3, density=0.0, seed=4)  # diagonal-only base
    # build a banded block matrix via scipy block diags
    import scipy.sparse as sps
    rng = np.random.default_rng(8)
    nb, bs = 16, 3
    blocks = {}
    for o in (-2, 0, 1):
        for i in range(nb):
            j = i + o
            if 0 <= j < nb:
                blk = rng.standard_normal((bs, bs))
                if o == 0:
                    blk += np.eye(bs) * 8.0
                blocks[(i, j)] = blk
    rows = sorted(blocks)
    rowptr = np.zeros(nb + 1, dtype=np.int32)
    for (i, _) in rows:
        rowptr[i + 1] += 1
    rowptr = np.cumsum(rowptr, dtype=np.int32)
    colind = np.array([j for (_, j) in rows], dtype=np.int32)
    vals = np.stack([blocks[k] for k in rows])
    from blasted_tpu.sparse.bsr import BSRMatrix
    Bm = BSRMatrix.from_arrays(rowptr, colind, vals, bs)
    D = bdia_from_bsr(Bm)

    p = BlockDiaILU0Preconditioner(D, nbuildsweeps=4, napplysweeps=2)
    p.compute()
    new_data = np.asarray(D.data) * 0.9
    p.update_values(new_data)
    p.compute()
    fresh = BlockDiaILU0Preconditioner(D.with_new_data(jnp.asarray(new_data)),
                                       nbuildsweeps=4, napplysweeps=2)
    fresh.compute()
    np.testing.assert_array_equal(np.asarray(p.state.ilu),
                                  np.asarray(fresh.state.ilu))


def test_sai_update_values_bitwise():
    A = random_csr(40, density=0.1, seed=21)
    p = SAIPreconditioner(A.pad())
    p.compute()
    sym_before = p.symbolic
    new_vals = _perturbed_vals(A.vals)
    p.update_values(new_vals)
    p.compute()
    assert p.symbolic is sym_before
    fresh = SAIPreconditioner(A.with_vals(jnp.asarray(new_vals)).pad())
    fresh.compute()
    np.testing.assert_array_equal(np.asarray(p.state.sai_pad),
                                  np.asarray(fresh.state.sai_pad))


def test_multigrid_update_values_refreshes_hierarchy():
    from blasted_tpu.precond.multigrid import AMGSettings, MultigridPreconditioner

    A = random_csr(128, density=0.06, seed=31, diag_boost=3.0)
    s = AMGSettings(group=4, coarse_size=16)
    p = MultigridPreconditioner(A, s)
    p.compute()
    r = jnp.asarray(np.random.default_rng(1).standard_normal(128))

    new_vals = _perturbed_vals(A.vals)
    p.update_values(new_vals)
    p.compute()

    fresh = MultigridPreconditioner(A.with_vals(jnp.asarray(new_vals)), s)
    fresh.compute()
    np.testing.assert_allclose(np.asarray(p.apply(r)),
                               np.asarray(fresh.apply(r)), rtol=1e-13)


# ------------------------------------------------------------- PrecInfo ------

def test_precinfo_block_csr_remainder_decreases():
    B = random_bsr(24, 4, density=0.15, seed=17)
    rems = []
    for sweeps in (1, 3, 8):
        p = BlockILU0Preconditioner(B.pad(), nbuildsweeps=sweeps,
                                    compute_precinfo=True)
        info = p.compute()
        assert float(info.prec_rem_initial_norm) > 0.0
        assert float(info.upper_min_diag_dom) != 0.0 or \
            float(info.upper_avg_diag_dom) != 0.0
        rems.append(float(info.prec_remainder_norm))
    assert rems[1] < rems[0] and rems[2] < rems[1]
    assert rems[2] < float(info.prec_rem_initial_norm)


def test_precinfo_dia_and_bdia_populated():
    A = _banded_csr()
    D = dia_from_csr(A)
    p = DiaILU0Preconditioner(D, nbuildsweeps=6, compute_precinfo=True)
    info = p.compute()
    assert float(info.prec_remainder_norm) < float(info.prec_rem_initial_norm)
    assert float(info.upper_avg_diag_dom) != 0.0

    # parity: DIA remainder == CSR remainder for the same matrix & sweeps
    pc = ILU0Preconditioner(A.pad(), nbuildsweeps=6, compute_precinfo=True)
    infoc = pc.compute()
    np.testing.assert_allclose(float(info.prec_remainder_norm),
                               float(infoc.prec_remainder_norm),
                               rtol=1e-10)

    # block DIA
    import scipy.sparse as sps
    rng = np.random.default_rng(9)
    nb, bs = 12, 4
    rowlist = []
    for o in (-1, 0, 2):
        for i in range(nb):
            if 0 <= i + o < nb:
                blk = rng.standard_normal((bs, bs))
                if o == 0:
                    blk += np.eye(bs) * 10.0
                rowlist.append((i, i + o, blk))
    rowlist.sort(key=lambda t: (t[0], t[1]))
    rowptr = np.zeros(nb + 1, dtype=np.int32)
    for (i, _, _) in rowlist:
        rowptr[i + 1] += 1
    rowptr = np.cumsum(rowptr, dtype=np.int32)
    from blasted_tpu.sparse.bsr import BSRMatrix
    Bm = BSRMatrix.from_arrays(
        rowptr, np.array([j for (_, j, _) in rowlist], dtype=np.int32),
        np.stack([b for (_, _, b) in rowlist]), bs)
    Db = bdia_from_bsr(Bm)
    pb = BlockDiaILU0Preconditioner(Db, nbuildsweeps=6, compute_precinfo=True)
    infob = pb.compute()
    assert float(infob.prec_remainder_norm) < float(infob.prec_rem_initial_norm)
    # parity with the padded-BSR block remainder
    pB = BlockILU0Preconditioner(Bm.pad(), nbuildsweeps=6,
                                 compute_precinfo=True)
    infoB = pB.compute()
    # both remainders sit at rounding-noise level after 6 sweeps (~1e-14);
    # the block-DIA factor runs in SoA layout (bdia_ilu0.py) whose summation
    # order differs from the padded-BSR einsum at the last bit, so parity is
    # up to an absolute noise floor, not bitwise
    np.testing.assert_allclose(float(infob.prec_remainder_norm),
                               float(infoB.prec_remainder_norm),
                               rtol=1e-10, atol=1e-12)


# --------------------------------------------------- one-call driver path ----

def test_solve_then_update_then_solve():
    """End-to-end: solve, perturb values, update through the context's
    preconditioner, recompute, solve again — no rebuild."""
    from blasted_tpu.api import BlastedOptions, compute_preconditioner, solve

    A = random_csr(80, density=0.08, seed=41)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(80)
    opts = BlastedOptions(pc_type="ilu0", async_sweeps=(4, 4),
                          ksp_type="bicgstab", rtol=1e-10, prefer_dia=False)
    x1, info1, ctx = solve(A, b, opts)
    assert bool(info1.converged)

    new_vals = _perturbed_vals(A.vals)
    ctx.prec.update_values(new_vals)
    compute_preconditioner(ctx)
    A2 = A.with_vals(jnp.asarray(new_vals))

    from blasted_tpu.ops.spmv import spmv
    from blasted_tpu.solvers import bicgstab
    x2, info2 = bicgstab(lambda x: spmv(ctx.prec.mat, x),
                         ctx.prec.apply_flat, jnp.asarray(b),
                         jnp.zeros(80), tol=1e-10, maxiter=200)
    res = np.asarray(A2.to_scipy() @ np.asarray(x2) - b)
    assert np.linalg.norm(res) / np.linalg.norm(b) < 1e-9
