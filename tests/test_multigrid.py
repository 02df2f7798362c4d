"""Multigrid (PCMG/PCGAMG-analogue) tests.

The reference reaches multigrid through PETSc: the stack walker attaches a
BLASTed smoother to every PCMG/PCGAMG level plus the coarse solve
(reference: src/blasted_petsc.cpp:610-630).  Here the hierarchy is
in-framework (precond/multigrid.py); these tests check the algebra of the
transfer operators against host scipy oracles, the contraction of the cycle
as a standalone relaxation, and the preconditioning quality (must beat the
single-level smoother it is built from) — the same must-beat tier as the
reference's upper_bound_its tests (tests/CMakeLists.txt:365-372).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from blasted_tpu import AsyncSolverSettings, PrecType, create_preconditioner
from blasted_tpu.apps import poisson3d_system
from blasted_tpu.ops.spmv import spmv
from blasted_tpu.precond.multigrid import (
    AMGSettings,
    MultigridPreconditioner,
    _prolong,
    _restrict,
    aggregation_prolongator,
    build_hierarchy,
)
from blasted_tpu.solvers import cg, gcr


def _poisson(shape=(12, 12, 12)):
    A, b, _ = poisson3d_system(shape, dist="chebyshev")
    return A, jnp.asarray(np.asarray(b)), A.to_scipy()


@pytest.mark.parametrize("n,group", [(64, 4), (61, 4), (50, 2), (33, 8)])
@pytest.mark.parametrize("smooth", [False, True])
def test_transfer_ops_match_host_prolongator(n, group, smooth):
    """Device prolong/restrict (repeat / reshape-sum, zero gathers) must equal
    P @ xc and P.T @ r for the host-built prolongator, incl. partial last
    aggregates and the damped-Jacobi smoothed form."""
    rng = np.random.default_rng(3)
    d = sps.diags(np.full(n, 4.0)) \
        + sps.diags(np.full(n - 1, -1.0), 1) + sps.diags(np.full(n - 1, -1.0), -1)
    A_sp = d.tocsr()
    P, omega = aggregation_prolongator(n, group, A_sp, smooth=smooth)

    from blasted_tpu.factory import to_device_matrix
    from blasted_tpu.precond.multigrid import _Level
    from blasted_tpu.sparse.csr import CSRMatrix

    lev = _Level(n=n, nc=P.shape[1], group=group,
                 A_dev=to_device_matrix(CSRMatrix.from_scipy(A_sp)),
                 AT_dev=None, smoother=None, omega=omega,
                 dinv=(jnp.asarray(1.0 / A_sp.diagonal())
                       if omega != 0.0 else None))

    xc = jnp.asarray(rng.standard_normal(P.shape[1]))
    r = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(_prolong(lev, xc)),
                               P @ np.asarray(xc), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(_restrict(lev, r)),
                               P.T @ np.asarray(r), rtol=1e-12, atol=1e-12)


def test_galerkin_hierarchy_stays_banded():
    """Contiguous aggregation of a banded operator keeps every level on the
    gather-free DIA fast path (the TPU payoff of the design)."""
    from blasted_tpu.sparse.dia import DiaMatrix

    A, _, _ = poisson3d_system((12, 12, 12), dist="uniform")  # symmetric FD
    levels, Ac = build_hierarchy(A, AMGSettings(group=4, coarse_size=100))
    assert len(levels) >= 2
    for lev in levels:
        assert isinstance(lev.A_dev, DiaMatrix)
    assert Ac.shape[0] <= 100
    # Galerkin PᵀAP of a symmetric A is symmetric with positive diagonal
    np.testing.assert_allclose(np.asarray(Ac), np.asarray(Ac).T,
                               rtol=1e-10, atol=1e-12)
    assert np.all(np.diag(np.asarray(Ac)) > 0)


def test_vcycle_contracts_error():
    """One V-cycle from the exact solution's perturbation must shrink the
    error substantially (the standalone-relaxation / Richardson form)."""
    A, b, sp = _poisson((12, 12, 12))
    mg = MultigridPreconditioner(A, AMGSettings(group=4, coarse_size=150))
    mg.compute()

    x_exact = np.linalg.solve(sp.toarray(), np.asarray(b))
    x0 = jnp.zeros_like(b)
    e0 = np.linalg.norm(x_exact)
    x1 = mg._cycle(0, b, x0)
    e1 = np.linalg.norm(np.asarray(x1) - x_exact)
    x2 = mg._cycle(0, b, x1)
    e2 = np.linalg.norm(np.asarray(x2) - x_exact)
    assert e1 < 0.35 * e0
    assert e2 < 0.35 * e1


@pytest.mark.parametrize("cycle", ["v", "w"])
def test_amg_preconditioned_cg_beats_smoother(cycle):
    """AMG-CG must converge with a true (scipy-checked) residual and in fewer
    outer iterations than single-level SGS-CG — the nested stack must beat
    its own leaf (reference upper_bound_its tier)."""
    A, b, sp = _poisson((14, 14, 14))
    P = A.pad()
    amat = lambda v: spmv(P, v)

    sgs = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.SGS, napplysweeps=2))
    sgs.compute()
    x_s, info_s = cg(amat, sgs.apply_flat, b, jnp.zeros_like(b),
                     tol=1e-9, maxiter=500)

    mg = MultigridPreconditioner(A, AMGSettings(cycle=cycle))
    mg.compute()
    x_m, info_m = cg(amat, mg.apply_flat, b, jnp.zeros_like(b),
                     tol=1e-9, maxiter=500)

    for x, info in ((x_s, info_s), (x_m, info_m)):
        assert bool(info.converged)
        r = sp @ np.asarray(x) - np.asarray(b)
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7
    assert int(info_m.iters) < int(info_s.iters)


def test_amg_iterations_scale_mildly():
    """Near mesh-independence: doubling the grid must not double the
    AMG-preconditioned iteration count (single-level methods do worse)."""
    its = {}
    for shape in ((8, 8, 8), (16, 16, 16)):
        A, b, _ = _poisson(shape)
        P = A.pad()
        amat = lambda v: spmv(P, v)
        mg = MultigridPreconditioner(A, AMGSettings())
        mg.compute()
        _, info = cg(amat, mg.apply_flat, b, jnp.zeros_like(b),
                     tol=1e-9, maxiter=500)
        assert bool(info.converged)
        its[shape] = int(info.iters)
    assert its[(16, 16, 16)] <= 2 * its[(8, 8, 8)]


def test_amg_apply_relax_standalone():
    """apply_relax = maxits cycles from x (the KSPRICHARDSON-path analogue,
    reference relax_local_blasted, blasted_petsc.cpp:519-576)."""
    from blasted_tpu.precond.base import SolveParams

    A, b, sp = _poisson((10, 10, 10))
    mg = MultigridPreconditioner(A, AMGSettings())
    mg.compute()
    mg.set_apply_params(SolveParams(maxits=12, usetol=False))
    x = mg.apply_relax(b, jnp.zeros_like(b))
    r = sp @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-8


def test_amg_factory_string():
    """'amg' is reachable through the factory (TPU-addition entry; the
    reference reaches MG via PETSc options instead)."""
    from blasted_tpu import create_preconditioner_from_string

    A, b, sp = _poisson((10, 10, 10))
    mg = create_preconditioner_from_string(A, "amg")
    assert isinstance(mg, MultigridPreconditioner)
    mg.compute()
    P = A.pad()
    x, info = gcr(lambda v: spmv(P, v), mg.apply_flat, b, jnp.zeros_like(b),
                  tol=1e-9, maxiter=300)
    assert bool(info.converged)
    r = sp @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7

    with pytest.raises(ValueError):
        create_preconditioner_from_string(A.pad(), "amg")


def test_amg_jit_closure():
    """The whole cycle must be traceable inside a jitted solve (static
    hierarchy, lax control flow only)."""
    import jax

    A, b, sp = _poisson((10, 10, 10))
    P = A.pad()
    mg = MultigridPreconditioner(A, AMGSettings())
    mg.compute()

    @jax.jit
    def solve(bb):
        return cg(lambda v: spmv(P, v), mg.apply_flat, bb,
                  jnp.zeros_like(bb), tol=1e-9, maxiter=300)

    x, info = solve(b)
    assert bool(info.converged)
    r = sp @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7


# ---------------------------------------------------------------------------
# Distributed MG (global hierarchy, shard-local smoothers — parallel/dist_mg)
# ---------------------------------------------------------------------------

def _mesh_or_skip(n):
    import jax

    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    from blasted_tpu.parallel import make_mesh

    return make_mesh(n)


def test_dist_mg_matches_oracle_and_beats_single_level():
    """Distributed AMG-CG must solve to the scipy-checked residual and take
    fewer outer iterations than the single-level shard-local preconditioner
    (the reference upper_bound_its tier, distributed form)."""
    from blasted_tpu.parallel import DistributedSolver
    from blasted_tpu.parallel.dist_mg import DistMGSolver

    mesh = _mesh_or_skip(8)
    A, b, _ = poisson3d_system((18, 18, 16), dist="uniform")  # 4096 rows
    sp = A.to_scipy()

    ds = DistMGSolver(A, mesh)
    x, info = ds.solve(b, method="cg", tol=1e-10, maxiter=500)
    assert bool(info.converged)
    r = sp @ np.asarray(x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-8

    d1 = DistributedSolver(A, mesh, AsyncSolverSettings(
        prec_type=PrecType.SGS, napplysweeps=2))
    _, info1 = d1.solve(b, method="cg", tol=1e-10, maxiter=500)
    assert int(info.iters) < int(info1.iters)


def test_dist_mg_levels_and_constraints():
    """Hierarchy respects divisibility gates; non-divisible inputs are
    identity-padded (the partition_csr posture) and still solve correctly;
    smoothed prolongator is rejected."""
    from blasted_tpu.parallel.dist_mg import DistMGSolver
    from blasted_tpu.sparse.csr import CSRMatrix

    mesh = _mesh_or_skip(8)
    A, _, _ = poisson3d_system((18, 18, 16), dist="uniform")
    ds = DistMGSolver(A, mesh)
    assert len(ds.levels) >= 2
    for lev in ds.levels:
        assert lev.n % 8 == 0 and lev.n % lev.group == 0

    n = 4097  # prime-ish: not divisible by the mesh → identity-padded
    bad = sps.identity(n, format="csr") * 2.0
    rhs = np.linspace(-1.0, 1.0, n)
    dm = DistMGSolver(CSRMatrix.from_scipy(bad), mesh)
    x, info = dm.solve(rhs, method="cg", tol=1e-12, maxiter=10)
    assert np.allclose(np.asarray(x)[:n], rhs / 2.0, atol=1e-10)
    with pytest.raises(ValueError):
        DistMGSolver(A, mesh, AMGSettings(smooth_prolongator=True))


def test_dist_mg_1device_matches_dense_solution():
    """A 1-device mesh reduces to a plain (block-Jacobi-free) MG solve whose
    answer matches the dense oracle."""
    from blasted_tpu.parallel.dist_mg import DistMGSolver

    mesh = _mesh_or_skip(1)
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    A, b, _ = poisson3d_system((10, 10, 10), dist="uniform")
    xref = np.linalg.solve(A.to_scipy().toarray(), np.asarray(b))
    ds = DistMGSolver(A, mesh)
    x, info = ds.solve(b, method="cg", tol=1e-10, maxiter=500)
    assert bool(info.converged)
    assert np.abs(np.asarray(x) - xref).max() / np.abs(xref).max() < 1e-6


# ---------------------------------------------------------------------------
# Structured-grid brick aggregation (grid_shape mode)
# ---------------------------------------------------------------------------

def test_brick_transfer_ops_match_host_prolongator():
    """Brick prolong/restrict (3-D broadcast / reshape-sum, zero gathers)
    must equal T @ xc and T.T @ r for the host tentative operator."""
    from blasted_tpu.precond.multigrid import _Level, brick_prolongator

    rng = np.random.default_rng(4)
    shape, brick = (4, 6, 2), (2, 2, 2)
    T, cshape = brick_prolongator(shape, brick)
    assert cshape == (2, 3, 1)
    n = int(np.prod(shape))
    lev = _Level(n=n, nc=T.shape[1], group=8, A_dev=None, AT_dev=None,
                 smoother=None, omega=0.0, dinv=None, shape=shape, brick=brick)
    xc = jnp.asarray(rng.standard_normal(T.shape[1]))
    r = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(_prolong(lev, xc)),
                               T @ np.asarray(xc), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(_restrict(lev, r)),
                               T.T @ np.asarray(r), rtol=1e-12, atol=1e-12)

    with pytest.raises(ValueError):
        brick_prolongator((5, 6, 2), (2, 2, 2))


def test_brick_hierarchy_mesh_independent_iterations():
    """Isotropic brick coarsening keeps AMG-CG iterations nearly flat with
    grid refinement (1-D index blocks semicoarsen and degrade with depth) and
    every Galerkin level on the DIA fast path."""
    from blasted_tpu.sparse.dia import DiaMatrix

    its = {}
    for shape in ((8, 8, 8), (16, 16, 16)):
        A, b, _ = poisson3d_system(tuple(s + 2 for s in shape),
                                   dist="uniform")
        bj = jnp.asarray(
            np.random.default_rng(1).standard_normal(A.nrows))
        P = A.pad()
        mg = MultigridPreconditioner(A, AMGSettings(grid_shape=shape))
        mg.compute()
        for lev in mg.levels:
            assert isinstance(lev.A_dev, DiaMatrix)
            assert lev.shape is not None
        _, info = cg(lambda v: spmv(P, v), mg.apply_flat, bj,
                     jnp.zeros_like(bj), tol=1e-9, maxiter=500)
        assert bool(info.converged)
        its[shape] = int(info.iters)
    # 8x the unknowns for at most ~1.5x the iterations
    assert its[(16, 16, 16)] <= 1.5 * its[(8, 8, 8)]


def test_brick_grid_shape_mismatch_rejected():
    A, _, _ = _poisson((10, 10, 10))
    with pytest.raises(ValueError):
        MultigridPreconditioner(
            A, AMGSettings(grid_shape=(4, 4, 4))).compute()
