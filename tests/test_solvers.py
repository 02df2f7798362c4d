"""End-to-end Krylov solve tests — the reference's `testsolve` pattern
(reference: tests/testsolve.cpp:28-123): build a system, solve with each
preconditioner, assert error vs the known solution below tolerance.
The Poisson-3D fixture plays the role of the stored CFD matrices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu import (
    AsyncSolverSettings,
    PrecType,
    SEQUENTIAL,
    create_preconditioner,
)
from blasted_tpu.apps import poisson3d_system
from blasted_tpu.config import ApplyInit
from blasted_tpu.ops.spmv import bspmv, spmv
from blasted_tpu.solvers import bicgstab, cg, gcr, richardson
from helpers import random_bsr, random_csr


def _solve_setup(npts=(10, 10, 10), dist="chebyshev"):
    A, b, uex = poisson3d_system(npts, dist=dist)
    P = A.pad()
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    return A, P, jnp.asarray(b), xref


def _amat(P):
    return lambda x: spmv(P, x)


@pytest.mark.parametrize("prec_name,sweeps", [
    ("none", 1),
    ("jacobi", 1),
    ("sgs", 4),
    ("ilu0", 4),
    ("seqilu0", 1),
    ("level_sgs", 1),
])
def test_bicgstab_poisson(prec_name, sweeps):
    """BiCGSTAB with each preconditioner reaches the direct solution
    (reference: testsolve.cpp:107-116 error assertion)."""
    A, P, b, xref = _solve_setup()
    settings = AsyncSolverSettings(prec_type=PrecType(prec_name),
                                   nbuildsweeps=sweeps, napplysweeps=sweeps)
    prec = create_preconditioner(P, settings)
    prec.compute()
    x0 = jnp.zeros_like(b)
    x, info = bicgstab(_amat(P), prec.apply_flat, b, x0, tol=1e-10, maxiter=800)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-7


def test_preconditioning_reduces_iterations():
    """ILU0 must beat Jacobi must beat unpreconditioned (iteration counts) —
    the upper_bound_its pattern (reference: tests/CMakeLists.txt:365-372)."""
    A, P, b, xref = _solve_setup()
    x0 = jnp.zeros_like(b)
    iters = {}
    for name, sweeps in (("none", 1), ("jacobi", 1), ("seqilu0", 1)):
        prec = create_preconditioner(
            P, AsyncSolverSettings(prec_type=PrecType(name),
                                   nbuildsweeps=sweeps, napplysweeps=sweeps))
        prec.compute()
        _, info = bicgstab(_amat(P), prec.apply_flat, b, x0,
                           tol=1e-8, maxiter=2000)
        assert bool(info.converged), name
        iters[name] = int(info.iters)
    assert iters["seqilu0"] < iters["jacobi"] <= iters["none"]


def test_richardson_with_ilu():
    A, P, b, xref = _solve_setup((8, 8, 8))
    prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.SEQILU0))
    prec.compute()
    x, info = richardson(_amat(P), prec.apply_flat, b, jnp.zeros_like(b),
                         tol=1e-10, maxiter=400)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_gcr_poisson():
    A, P, b, xref = _solve_setup()
    prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=3, napplysweeps=3))
    prec.compute()
    x, info = gcr(_amat(P), prec.apply_flat, b, jnp.zeros_like(b),
                  tol=1e-10, maxiter=500, nrestart=20)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_cg_uniform_poisson():
    """Uniform-grid Poisson is SPD → CG applies."""
    A, b, uex = poisson3d_system((10, 10, 10), dist="uniform")
    P = A.pad()
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.JACOBI))
    prec.compute()
    x, info = cg(_amat(P), prec.apply_flat, jnp.asarray(b),
                 jnp.zeros(A.nrows, dtype=jnp.float64), tol=1e-12, maxiter=500)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-8


def test_async_sweeps_iteration_parity():
    """Sweep-ILU0 iteration counts approach exact-ILU0 counts as sweeps grow —
    the TPU analogue of the reference's threaded compare_its tolerance tests
    (reference: tests/CMakeLists.txt:374-424, tolerances 1-5%)."""
    A, P, b, xref = _solve_setup()
    x0 = jnp.zeros_like(b)

    def run(nbuild, napply):
        prec = create_preconditioner(
            P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                                   nbuildsweeps=nbuild, napplysweeps=napply))
        prec.compute()
        _, info = bicgstab(_amat(P), prec.apply_flat, b, x0,
                           tol=1e-8, maxiter=2000)
        assert bool(info.converged)
        return int(info.iters)

    exact_prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.SEQILU0))
    exact_prec.compute()
    _, info = bicgstab(_amat(P), exact_prec.apply_flat, b, x0,
                       tol=1e-8, maxiter=2000)
    it_exact = int(info.iters)

    it_sweep = run(6, 6)
    # within 30% of the exact-ILU iteration count (BiCGSTAB iteration counts
    # are noisy; the reference compares across *matching* algorithms at 1-5%)
    assert it_sweep <= max(it_exact * 1.3, it_exact + 4)


def test_block_solve_bsr():
    """Block path end-to-end: BSR matrix, block ILU0 + BiCGSTAB."""
    bs = 4
    B = random_bsr(40, bs, density=0.12, seed=33)
    Pb = B.pad()
    n = B.nrows
    rng = np.random.default_rng(33)
    xref = rng.standard_normal(n)
    b = B.to_scipy() @ xref

    prec = create_preconditioner(
        Pb, AsyncSolverSettings(prec_type=PrecType.ILU0,
                                nbuildsweeps=SEQUENTIAL,
                                napplysweeps=SEQUENTIAL))
    prec.compute()

    def amat(x):
        return bspmv(Pb, x.reshape(-1, bs)).reshape(-1)

    x, info = bicgstab(amat, prec.apply_flat, jnp.asarray(b),
                       jnp.zeros(n, dtype=jnp.float64), tol=1e-12, maxiter=300)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-9


def test_jitted_full_solve():
    """An entire preconditioned solve jits into one XLA computation."""
    A, P, b, xref = _solve_setup((8, 8, 8))
    prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=3, napplysweeps=3))
    prec.compute()

    @jax.jit
    def solve(bvec):
        return bicgstab(_amat(P), prec.apply_flat, bvec,
                        jnp.zeros_like(bvec), tol=1e-10, maxiter=500)

    x, info = solve(b)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_gmres_poisson():
    A, P, b, xref = _solve_setup()
    prec = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=3, napplysweeps=3))
    prec.compute()
    from blasted_tpu.solvers import gmres
    x, info = gmres(_amat(P), prec.apply_flat, b, jnp.zeros_like(b),
                    tol=1e-10, maxiter=500, nrestart=25)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_gmres_matches_scipy_iterations_unpreconditioned():
    """GMRES iteration count within a few of scipy's gmres on the same system
    (same restart) — algorithmic parity check."""
    import scipy.sparse.linalg as spla

    A, P, b, xref = _solve_setup((8, 8, 8))
    from blasted_tpu.solvers import gmres
    x, info = gmres(_amat(P), lambda r: r, b, jnp.zeros_like(b),
                    tol=1e-8, maxiter=2000, nrestart=30)
    assert bool(info.converged)

    count = {"n": 0}
    spla.gmres(A.to_scipy(), np.asarray(b), rtol=1e-8, restart=30,
               maxiter=100, callback=lambda r: count.__setitem__("n", count["n"] + 1),
               callback_type="pr_norm")
    # scipy counts inner iterations via callback
    assert abs(int(info.iters) - count["n"]) <= max(6, 0.15 * count["n"])


# ------------------------------------------------------ breakdown guards -----

def test_bicgstab_breakdown_returns_finite_x_and_flag():
    """rhat ⟂ A·p on a rotation operator: alpha = rho/(rhat·v) is undefined.
    The guarded solver must return a finite iterate plus breakdown=True
    instead of silently propagating NaN through the while_loop."""
    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    b = jnp.asarray([1.0, 0.0])
    x, info = bicgstab(lambda x: A @ x, lambda r: r, b, jnp.zeros(2),
                       tol=1e-12, maxiter=50)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(info.breakdown)
    assert not bool(info.converged)


def test_cg_breakdown_on_indefinite_operator():
    """p·Ap = 0 on an indefinite diagonal: CG breaks down at step one."""
    A = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    b = jnp.asarray([1.0, 1.0])
    x, info = cg(lambda x: A @ x, lambda r: r, b, jnp.zeros(2),
                 tol=1e-12, maxiter=50)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(info.breakdown)


def test_gcr_breakdown_on_singular_operator():
    """A·p = 0 for the first direction (singular operator): q·q = 0."""
    A = jnp.asarray([[0.0, 0.0], [0.0, 1.0]])
    b = jnp.asarray([1.0, 0.0])
    x, info = gcr(lambda x: A @ x, lambda r: r, b, jnp.zeros(2),
                  tol=1e-12, maxiter=50, nrestart=5)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(info.breakdown)


def test_bicgstab_lucky_breakdown_converges():
    """Exact solve by the preconditioner: t = A·z with rs = 0 ⇒ lucky
    breakdown path must still report convergence, not failure."""
    rng = np.random.default_rng(5)
    Ad = jnp.asarray(rng.standard_normal((6, 6)) + 6 * np.eye(6))
    Ainv = jnp.linalg.inv(Ad)
    b = jnp.asarray(rng.standard_normal(6))
    x, info = bicgstab(lambda x: Ad @ x, lambda r: Ainv @ r, b, jnp.zeros(6),
                       tol=1e-10, maxiter=50)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(Ad @ x - b)) < 1e-8


def test_gmres_breakdown_flag_on_singular_operator():
    """Arnoldi breakdown without convergence (structurally singular
    operator) sets SolveInfo.breakdown; the iterate stays finite."""
    from blasted_tpu.solvers import gmres

    A = jnp.asarray([[0.0, 0.0], [0.0, 1.0]])
    b = jnp.asarray([1.0, 0.0])
    x, info = gmres(lambda x: A @ x, lambda r: r, b, jnp.zeros(2),
                    tol=1e-12, maxiter=50, nrestart=5)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(info.breakdown)
    assert not bool(info.converged)


def test_gmres_happy_breakdown_not_flagged():
    """Exact invariant subspace WITH convergence is a happy breakdown:
    converged=True, breakdown=False."""
    from blasted_tpu.solvers import gmres

    rng = np.random.default_rng(8)
    Ad = jnp.asarray(rng.standard_normal((6, 6)) + 6 * np.eye(6))
    Ainv = jnp.linalg.inv(Ad)
    b = jnp.asarray(rng.standard_normal(6))
    x, info = gmres(lambda x: Ad @ x, lambda r: Ainv @ r, b, jnp.zeros(6),
                    tol=1e-10, maxiter=50, nrestart=10)
    assert bool(info.converged)
    assert not bool(info.breakdown)
