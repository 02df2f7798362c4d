"""Validation against the reference's own golden CFD/structural systems
(read directly from the read-only reference tree; skipped when absent).

These replicate the reference's `testsolve` entries (tests/CMakeLists.txt:
34-173): read the Matrix-Market system + stored RHS and solution, solve with
each preconditioner, assert the error against the stored solution —
boeing-msc00726 (SPD structural, CSR), fvens-2dcyl1 (compressible-flow
Jacobian, block size 4), fluorem-DK01R (block size 7)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu import AsyncSolverSettings, PrecType, SEQUENTIAL, create_preconditioner
from blasted_tpu.ops.spmv import bspmv, spmv
from blasted_tpu.solvers import bicgstab, cg, gcr
from blasted_tpu.sparse import (
    bsr_from_coo,
    csr_from_coo,
    read_matrix_market,
    read_matrix_market_vector,
)

REF = "/root/reference/tests"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def _load(matdir, name):
    coo = read_matrix_market(f"{matdir}/{name}.mtx")
    b = read_matrix_market_vector(f"{matdir}/{name}_b.mtx")
    x = read_matrix_market_vector(f"{matdir}/{name}_x.mtx")
    return coo, b, x


def _err(x, xref):
    # the reference's error norm: ‖x − x*‖₂/√n (testsolve.cpp:107-116)
    return np.linalg.norm(np.asarray(x) - xref) / np.sqrt(len(xref))


@pytest.mark.parametrize("prec,sweeps,scaling", [
    ("jacobi", (1, 1), False),
    ("sgs", (1, 6), False),
    ("ilu0", (SEQUENTIAL, SEQUENTIAL), False),
    # msc00726 is SPD but not diagonally dominant: the synchronous sweep
    # triangular solves need the symmetric scaling + more apply sweeps
    # (the reference enables -blasted_use_symmetric_scaling on this matrix
    # too; SURVEY.md §7 hard part 3)
    ("ilu0", (10, 15), True),
])
def test_msc00726_bicgstab(prec, sweeps, scaling):
    coo, b, xref = _load(f"{REF}/input/boeing-msc00726", "msc00726")
    A = csr_from_coo(coo)
    P = A.pad()
    settings = AsyncSolverSettings(prec_type=PrecType(prec),
                                   nbuildsweeps=sweeps[0],
                                   napplysweeps=sweeps[1],
                                   use_symmetric_scaling=scaling)
    p = create_preconditioner(P, settings)
    p.compute()
    x, info = bicgstab(lambda v: spmv(P, v), p.apply_flat, jnp.asarray(b),
                       jnp.zeros(A.nrows, dtype=jnp.float64),
                       tol=1e-11, maxiter=3000)
    assert bool(info.converged)
    assert _err(x, xref) < 1e-6


def test_2dcyl1_block_ilu0():
    """The reference's central CFD fixture at block size 4
    (tests/CMakeLists.txt BSR4 testsolve entries)."""
    coo, b, xref = _load(f"{REF}/input/fvens-2dcyl1", "2dcyl1")
    B = bsr_from_coo(coo, 4)
    P = B.pad()
    p = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=SEQUENTIAL,
                               napplysweeps=SEQUENTIAL))
    p.compute()

    def amat(x):
        return bspmv(P, x.reshape(-1, 4)).reshape(-1)

    x, info = bicgstab(amat, p.apply_flat, jnp.asarray(b),
                       jnp.zeros(B.nrows, dtype=jnp.float64),
                       tol=1e-9, maxiter=3000)
    assert bool(info.converged)
    assert _err(x, xref) < 1e-5


def test_2dcyl1_block_sweep_ilu0_gcr():
    coo, b, xref = _load(f"{REF}/input/fvens-2dcyl1", "2dcyl1")
    B = bsr_from_coo(coo, 4)
    P = B.pad()
    p = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=10, napplysweeps=15))
    p.compute()

    def amat(x):
        return bspmv(P, x.reshape(-1, 4)).reshape(-1)

    x, info = gcr(amat, p.apply_flat, jnp.asarray(b),
                  jnp.zeros(B.nrows, dtype=jnp.float64),
                  tol=1e-9, maxiter=4000, nrestart=40)
    assert bool(info.converged)
    assert _err(x, xref) < 1e-5


def test_dk01r_block7():
    """fluorem-DK01R at block size 7 (reference: mat_ops BSR7 fixtures)."""
    coo, b, xref = _load(f"{REF}/mat_ops/input/fluorem-dk01r", "DK01R")
    B = bsr_from_coo(coo, 7)
    P = B.pad()
    p = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=SEQUENTIAL,
                               napplysweeps=SEQUENTIAL))
    p.compute()

    def amat(x):
        return bspmv(P, x.reshape(-1, 7)).reshape(-1)

    x, info = bicgstab(amat, p.apply_flat, jnp.asarray(b),
                       jnp.zeros(B.nrows, dtype=jnp.float64),
                       tol=1e-10, maxiter=4000)
    assert bool(info.converged)
    # stored solution column for DK01R is a sample; check true residual too
    r = np.asarray(amat(x)) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_msc00726_spmv_golden():
    """SpMV against the stored x/b pair where b ≈ A·x? (the mat_ops pattern:
    stored vector pairs as kernel goldens).  Here: residual of the stored
    solution is small relative to b."""
    coo, b, xref = _load(f"{REF}/input/boeing-msc00726", "msc00726")
    A = csr_from_coo(coo)
    P = A.pad()
    r = np.asarray(spmv(P, jnp.asarray(xref))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


# ---------------------------------------------------------------------------
# float32 tier (VERDICT r2 #2): the TPU chips this framework targets have no
# native f64 (v5e/v6e), so the reference's golden systems must also solve in
# f32.  Pure-f32 runs are asserted at f32-appropriate tolerances (measured:
# no iteration inflation vs f64 on these fixtures); the reference's own f64
# tolerances (tests/CMakeLists.txt solver_tol 1e-10 / test_tol 1e-8..1e-10)
# are recovered by mixed-precision iterative refinement (api.solve_refined:
# all device work in f32, host f64 residual outer loop).
# ---------------------------------------------------------------------------

def test_msc00726_f32_vs_f64_ilu0():
    """Pure-f32 exact ILU0 + BiCGSTAB converges with no iteration inflation
    (measured: 23 f32 vs 30 f64) to the f32 accuracy floor."""
    coo, b, xref = _load(f"{REF}/input/boeing-msc00726", "msc00726")
    A = csr_from_coo(coo)
    iters = {}
    for dt, tol in ((np.float64, 1e-11), (np.float32, 2e-7)):
        P = A.astype(dt).pad()
        p = create_preconditioner(P, AsyncSolverSettings(
            prec_type=PrecType.ILU0, nbuildsweeps=SEQUENTIAL,
            napplysweeps=SEQUENTIAL))
        p.compute()
        x, info = bicgstab(lambda v: spmv(P, v), p.apply_flat,
                           jnp.asarray(b.astype(dt)),
                           jnp.zeros(A.nrows, dtype=dt), tol=tol, maxiter=3000)
        assert bool(info.converged)
        iters[np.dtype(dt).name] = int(info.iters)
        if dt == np.float32:
            assert _err(x, xref) < 1e-4          # measured 1.3e-5
    assert iters["float32"] <= int(1.5 * iters["float64"]) + 10


def test_msc00726_f32_scaled_sweep_ilu0():
    """f32 + symmetric scaling + bounded sweeps (the production TPU config
    for this matrix, cf. the f64 variant above).

    f32 finding (measured): the Chow-Patel fixed point needs ~3x the build
    sweeps of f64 on this non-diagonally-dominant SPD matrix — at (10,15)
    the f32 factorization error leaves BiCGSTAB stagnating at relres ~5e-3
    (breakdown flagged); at (30,15) it converges in 20 iterations (vs 20 in
    f64 at (10,15)).  More *apply* sweeps alone make it worse (transient
    growth of the non-normal triangular Jacobi iteration amplifies f32
    rounding)."""
    coo, b, xref = _load(f"{REF}/input/boeing-msc00726", "msc00726")
    P = csr_from_coo(coo).astype(np.float32).pad()
    p = create_preconditioner(P, AsyncSolverSettings(
        prec_type=PrecType.ILU0, nbuildsweeps=30, napplysweeps=15,
        use_symmetric_scaling=True))
    p.compute()
    x, info = bicgstab(lambda v: spmv(P, v), p.apply_flat,
                       jnp.asarray(b.astype(np.float32)),
                       jnp.zeros(P.nrows, dtype=np.float32),
                       tol=2e-7, maxiter=3000)
    assert bool(info.converged)
    assert int(info.iters) <= 60
    assert _err(x, xref) < 5e-4                  # measured 6.7e-5


def test_2dcyl1_f32_block_ilu0():
    """The central CFD fixture at bs=4 in f32 (measured: 32 iters vs 46 in
    f64 — no inflation; error 1.5e-6)."""
    coo, b, xref = _load(f"{REF}/input/fvens-2dcyl1", "2dcyl1")
    P = bsr_from_coo(coo, 4).astype(np.float32).pad()
    p = create_preconditioner(P, AsyncSolverSettings(
        prec_type=PrecType.ILU0, nbuildsweeps=SEQUENTIAL,
        napplysweeps=SEQUENTIAL))
    p.compute()

    def amat(x):
        return bspmv(P, x.reshape(-1, 4)).reshape(-1)

    x, info = bicgstab(amat, p.apply_flat, jnp.asarray(b.astype(np.float32)),
                       jnp.zeros(P.nbrows * 4, dtype=np.float32),
                       tol=5e-7, maxiter=3000)
    assert bool(info.converged)
    assert int(info.iters) <= 90
    assert _err(x, xref) < 1e-5


def test_dk01r_f32_block7():
    coo, b, xref = _load(f"{REF}/mat_ops/input/fluorem-dk01r", "DK01R")
    P = bsr_from_coo(coo, 7).astype(np.float32).pad()
    p = create_preconditioner(P, AsyncSolverSettings(
        prec_type=PrecType.ILU0, nbuildsweeps=SEQUENTIAL,
        napplysweeps=SEQUENTIAL))
    p.compute()

    def amat(x):
        return bspmv(P, x.reshape(-1, 7)).reshape(-1)

    bf = b.astype(np.float32)
    x, info = bicgstab(amat, p.apply_flat, jnp.asarray(bf),
                       jnp.zeros(P.nbrows * 7, dtype=np.float32),
                       tol=5e-7, maxiter=3000)
    assert bool(info.converged)
    r = np.asarray(amat(x), dtype=np.float64) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-5


def test_poisson_f32_iteration_parity():
    """f32 vs f64 iteration parity on the reference's own Poisson fixture
    (16^3 Chebyshev; reference: tests/poisson3d-fd) through the full api
    path (DIA fast path + sweep ILU0)."""
    from blasted_tpu.api import solve
    from blasted_tpu.apps import poisson3d_system

    A, b, _ = poisson3d_system((16, 16, 16), dist="chebyshev")
    opts = {"blasted_pc_type": "ilu0", "blasted_async_sweeps": "4,4",
            "ksp_type": "bicgstab", "rtol": 1e-6, "maxiter": 500}
    iters = {}
    for dt in (np.float64, np.float32):
        x, info, _ = solve(A.astype(dt), b.astype(dt), opts)
        assert bool(info.converged)
        iters[np.dtype(dt).name] = int(info.iters)
    assert abs(iters["float32"] - iters["float64"]) <= 5


@pytest.mark.parametrize("name,matdir,bs,tol_err", [
    ("msc00726", "input/boeing-msc00726", 1, 1e-9),
    ("2dcyl1", "input/fvens-2dcyl1", 4, 1e-8),
])
def test_refined_f32_reaches_reference_tolerances(name, matdir, bs, tol_err):
    """Mixed-precision iterative refinement: ALL device work in f32, f64
    residual outer loop on host — recovers the reference's f64 test
    tolerances (test_tol 1e-8..1e-10, tests/CMakeLists.txt:34-173; measured
    errors 1.5e-13 / 1.6e-12 here, well below).  Total inner-iteration
    inflation vs the plain f64 solve is bounded (measured 63 vs 46 on
    2dcyl1)."""
    from blasted_tpu.api import solve_refined

    coo, b, xref = _load(f"{REF}/{matdir}", name)
    A = csr_from_coo(coo) if bs == 1 else bsr_from_coo(coo, bs)
    x, info, _ = solve_refined(
        A, b, {"blasted_pc_type": "ilu0", "blasted_async_sweeps": "-1,-1",
               "rtol": 1e-11, "maxiter": 3000, "prefer_dia": False},
        nrefine=3)
    assert bool(info.converged)
    assert info.resnorm / info.bnorm < 1e-10
    assert _err(x, xref) < tol_err
    assert int(info.iters) <= 160                # inner-iteration cap


def test_2dcyl1_uneven_3shard_mesh():
    """The reference's own mpirun -n 3 distributed fixture: 2dcyl1's 446
    block rows (1784 scalar rows / bs=4) do NOT divide by 3 (reference:
    tests/CMakeLists.txt:213-228 runs MPIPetsc tests with -n 3 on this
    matrix; PETSc partitions arbitrary sizes).  Identity-padded block-row
    sharding over a 3-device mesh must reproduce the stored solution."""
    from blasted_tpu.parallel import DistributedSolver, make_mesh

    coo, b, xref = _load(f"{REF}/input/fvens-2dcyl1", "2dcyl1")
    B = bsr_from_coo(coo, 4)
    assert B.nrows == 1784 and B.nbrows % 3 != 0
    mesh = make_mesh(3)
    ds = DistributedSolver(
        B, mesh, AsyncSolverSettings(prec_type=PrecType.ILU0,
                                     nbuildsweeps=10, napplysweeps=15))
    x, info = ds.solve(b, method="gcr", tol=1e-9, maxiter=4000, nrestart=40)
    assert bool(info.converged)
    assert x.shape[0] == B.nrows
    assert _err(x, xref) < 1e-5
