"""API-layer tests: option parsing, the PCShell-callback triad, one-call
solve, timers (reference analogue: the -blasted_* option namespace and
Blasted_data context, doc/user-doc.md:6-31, blasted_petsc.h:31-85)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu.api import (
    BlastedOptions,
    apply_local,
    compute_preconditioner,
    relax_local,
    setup_local_preconditioner,
    solve,
)
from blasted_tpu.apps import poisson3d_system
from blasted_tpu.config import PrecType
from helpers import random_csr


def test_options_from_argv():
    o = BlastedOptions.from_argv(
        ["-blasted_pc_type", "ilu0", "-blasted_async_sweeps", "4,3",
         "-blasted_use_symmetric_scaling",
         "-blasted_async_fact_init_type", "init_sgs",
         "-blasted_thread_chunk_size", "512"])
    assert o.pc_type == "ilu0"
    assert o.async_sweeps == (4, 3)
    assert o.use_symmetric_scaling is True
    assert o.fact_init_type == "init_sgs"
    s = o.settings()
    assert s.nbuildsweeps == 4 and s.napplysweeps == 3


def test_options_sequential_sweeps():
    o = BlastedOptions.from_dict({"blasted_pc_type": "ilu0",
                                  "blasted_async_sweeps": "-1,-1"})
    assert o.async_sweeps == (-1, -1)


def test_unknown_option_rejected():
    with pytest.raises(ValueError):
        BlastedOptions.from_dict({"blasted_bogus": 1})


def test_pcshell_triad_and_timers():
    A, b, _ = poisson3d_system((8, 8, 8), dist="chebyshev")
    ctx = setup_local_preconditioner(
        A, {"blasted_pc_type": "ilu0", "blasted_async_sweeps": "3,3"})
    compute_preconditioner(ctx)
    z = apply_local(ctx, b)
    assert z.shape == (A.nrows,)
    assert ctx.timers.factor_calls == 1
    assert ctx.timers.apply_calls == 1
    assert ctx.timers.factor_walltime > 0
    assert ctx.timers.apply_walltime > 0


def test_relax_local():
    A, b, _ = poisson3d_system((8, 8, 8), dist="uniform")
    ctx = setup_local_preconditioner(A, {"blasted_pc_type": "jacobi"})
    compute_preconditioner(ctx)
    x0 = np.zeros(A.nrows)
    x = relax_local(ctx, b, x0, maxits=50)
    # 50 Jacobi steps must reduce the residual
    r0 = np.linalg.norm(b)
    r = np.linalg.norm(b - A.to_scipy() @ np.asarray(x))
    assert r < 0.5 * r0


@pytest.mark.parametrize("ksp", ["bicgstab", "gmres", "gcr", "richardson"])
def test_one_call_solve(ksp):
    A, b, _ = poisson3d_system((9, 9, 9), dist="chebyshev")
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    x, info, ctx = solve(A, b, {"blasted_pc_type": "ilu0",
                                "blasted_async_sweeps": "-1,-1",
                                "ksp_type": ksp, "rtol": 1e-10,
                                "maxiter": 2000})
    assert bool(info.converged), ksp
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_one_call_solve_distributed():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from blasted_tpu.parallel import make_mesh

    A, b, _ = poisson3d_system((10, 10, 10), dist="uniform")
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    mesh = make_mesh(4)
    x, info, ds = solve(A, b, {"blasted_pc_type": "ilu0",
                               "blasted_async_sweeps": "4,4",
                               "ksp_type": "bicgstab", "rtol": 1e-10,
                               "maxiter": 1500}, mesh=mesh)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_convergence_history_utility():
    """Reference analogue: async_ilu_convergence — residual and factor errors
    drop to ~machine precision within bounded sweeps."""
    from blasted_tpu.utils.convergence import ilu_convergence_history

    A, _, _ = poisson3d_system((8, 8, 8), dist="chebyshev")
    h = ilu_convergence_history(A, max_sweeps=40)
    assert h["remainder"][-1] < 1e-10 * h["remainder"][0]
    assert h["l_error"][-1] < 1e-10
    assert h["u_error"][-1] < 1e-8
    # overall downward trend (reference asserts monotone decrease per sweep
    # group; synchronous sweeps give near-monotone behaviour)
    assert h["l_error"][40] < h["l_error"][10] < h["l_error"][0]


def test_solve_unstructured_rcm_banding():
    """An unstructured banded-after-RCM system routes through the DIA fast
    path transparently (permutation handled inside solve)."""
    import scipy.sparse as sps
    from blasted_tpu.sparse.csr import CSRMatrix

    rng = np.random.default_rng(5)
    n = 120
    # banded matrix hidden behind a random permutation
    diags = {0: 4.0 + rng.random(n)}
    for o in (1, 2, 5):
        diags[o] = rng.standard_normal(n - o) * 0.3
        diags[-o] = rng.standard_normal(n - o) * 0.3
    sp = sps.diags([diags[o] for o in sorted(diags)],
                   [o for o in sorted(diags)]).tocsr()
    perm = rng.permutation(n)
    sp = sp[perm][:, perm].tocsr()
    sp.sort_indices()
    A = CSRMatrix.from_scipy(sp)
    xref = rng.standard_normal(n)
    b = sp @ xref

    x, info, ctx = solve(A, b, {"blasted_pc_type": "ilu0",
                                "blasted_async_sweeps": "4,4",
                                "rtol": 1e-11, "maxiter": 600})
    assert bool(info.converged)
    # the preconditioner ran on a DIA matrix (banding succeeded)
    from blasted_tpu.sparse.dia import DiaMatrix
    assert isinstance(ctx.prec.mat, DiaMatrix)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-8


def test_one_call_solve_amg():
    """'-blasted_pc_type amg' routes through the hierarchy-from-host path
    (the PCMG-analogue, precond/multigrid.py) in the one-call driver."""
    from blasted_tpu.precond import MultigridPreconditioner

    A, b, _ = poisson3d_system((12, 12, 12), dist="chebyshev")
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    x, info, ctx = solve(A, b, {"blasted_pc_type": "amg",
                                "ksp_type": "cg", "rtol": 1e-10,
                                "maxiter": 500})
    assert bool(info.converged)
    assert isinstance(ctx.prec, MultigridPreconditioner)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6

    import jax

    if len(jax.devices()) >= 4:
        # mesh route: global hierarchy, shard-local smoothers (dist_mg.py)
        from blasted_tpu.parallel import make_mesh
        from blasted_tpu.parallel.dist_mg import DistMGSolver

        A, b, _ = poisson3d_system((18, 18, 16), dist="uniform")  # 4096 rows
        xref = np.linalg.solve(A.to_scipy().toarray(), b)
        x, info, ctx = solve(A, b, {"blasted_pc_type": "amg",
                                    "ksp_type": "cg", "rtol": 1e-10,
                                    "maxiter": 500}, mesh=make_mesh(4))
        assert isinstance(ctx.prec, DistMGSolver)
        assert bool(info.converged)
        err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
        assert err < 1e-6


def test_amg_options_roundtrip():
    """-blasted_amg_* options reach AMGSettings (and the factory honors
    them) — the per-level smoother configuration the reference walker does
    for PCMG stacks (blasted_petsc.cpp:610-630)."""
    o = BlastedOptions.from_argv([
        "-blasted_pc_type", "amg",
        "-blasted_amg_group", "8",
        "-blasted_amg_cycle", "w",
        "-blasted_amg_npre", "2", "-blasted_amg_npost", "3",
        "-blasted_amg_max_levels", "5",
        "-blasted_amg_coarse_size", "64",
        "-blasted_amg_smoother_kind", "jacobi",
        "-blasted_amg_sub_pc_type", "ilu0",
        "-blasted_amg_jacobi_omega", "1.1",
        "-blasted_amg_grid_shape", "10,10,10",
        "-blasted_async_sweeps", "3,4",
    ])
    s = o.amg_settings()
    assert (s.group, s.cycle, s.npre, s.npost) == (8, "w", 2, 3)
    assert (s.max_levels, s.coarse_size) == (5, 64)
    assert s.smoother_kind == "jacobi" and s.jacobi_omega == 1.1
    assert s.grid_shape == (10, 10, 10)
    assert s.smoother.prec_type == PrecType.ILU0
    assert (s.smoother.nbuildsweeps, s.smoother.napplysweeps) == (3, 4)
    # settings() carries the AMGSettings into the factory
    ss = o.settings()
    assert ss.amg is not None and ss.amg.cycle == "w"

    from blasted_tpu.precond import MultigridPreconditioner

    A, b, _ = poisson3d_system((8, 8, 8))
    ctx = setup_local_preconditioner(A, {"blasted_pc_type": "amg",
                                         "blasted_amg_npre": "2",
                                         "blasted_amg_cycle": "w"})
    assert isinstance(ctx.prec, MultigridPreconditioner)
    assert ctx.prec.settings.npre == 2 and ctx.prec.settings.cycle == "w"


def test_mesh_amg_nondefault_smoother():
    """solve(..., mesh=...) with pc_type=amg forwards the -blasted_amg_*
    namespace to DistMGSolver (smoother sub-type + cycle knobs)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from blasted_tpu.parallel import make_mesh

    A, b, _ = poisson3d_system((18, 18, 16), dist="uniform")  # 4096 rows
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    x, info, ctx = solve(A, b, {"blasted_pc_type": "amg",
                                "blasted_amg_sub_pc_type": "jacobi",
                                "blasted_amg_npre": "2",
                                "blasted_amg_npost": "2",
                                "blasted_amg_cycle": "w",
                                "ksp_type": "cg", "rtol": 1e-10,
                                "maxiter": 500}, mesh=make_mesh(4))
    assert bool(info.converged)
    ds = ctx.prec
    assert ds.settings.cycle == "w" and ds.settings.npre == 2
    assert ds.settings.smoother.prec_type == PrecType.JACOBI
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-6


def test_mesh_solve_context_observability():
    """The mesh path returns a real SolverContext: factor/apply timers and
    (with compute_precinfo) a reduced per-shard PrecInfo — the analogue of
    the reference's per-rank accumulation (blasted_petsc.h:56-84;
    VERDICT r2 #7)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from blasted_tpu.api import SolverContext, solve
    from blasted_tpu.parallel import make_mesh
    from helpers import random_csr

    A = random_csr(256, density=0.04, seed=13)   # unstructured → general path
    b = A.to_scipy() @ np.ones(256)
    x, info, ctx = solve(
        A, b, {"blasted_pc_type": "ilu0", "blasted_async_sweeps": "4,4",
               "blasted_compute_preconditioner_info": "1",
               "prefer_dia": False, "rtol": 1e-10, "maxiter": 500},
        mesh=make_mesh(4))
    assert bool(info.converged)
    assert isinstance(ctx, SolverContext)
    assert ctx.timers.factor_walltime > 0.0
    assert ctx.timers.apply_walltime > 0.0
    assert len(ctx.infolist) == 1
    pi = ctx.infolist[0]
    assert float(pi.prec_remainder_norm) > 0.0          # sweep ILU: nonzero
    assert 0.0 < float(pi.lower_min_diag_dom) <= float(pi.lower_avg_diag_dom)


def test_mesh_dia_path_precinfo():
    """The banded (DIA/ppermute) mesh path also reports PrecInfo, reduced
    across shards inside shard_map (psum/pmin) — scalar and block."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from blasted_tpu.api import solve
    from blasted_tpu.parallel import make_mesh
    from blasted_tpu.parallel.dist_dia import DistBlockDiaSolver, DistDiaSolver

    A, b, _ = poisson3d_system((10, 10, 10), dist="uniform")   # 512 rows
    x, info, ctx = solve(
        A, b, {"blasted_pc_type": "ilu0", "blasted_async_sweeps": "4,4",
               "blasted_compute_preconditioner_info": "1",
               "rtol": 1e-9, "maxiter": 500}, mesh=make_mesh(4))
    assert bool(info.converged)
    assert isinstance(ctx.prec, DistDiaSolver)
    assert len(ctx.infolist) == 1
    pi = ctx.infolist[0]
    assert float(pi.prec_remainder_norm) > 0.0
    assert float(pi.lower_min_diag_dom) <= float(pi.lower_avg_diag_dom)

    # block path (banded bs=2 matrix)
    from helpers import random_bsr
    import scipy.sparse as sps

    from blasted_tpu import BSRMatrix

    rng = np.random.default_rng(3)
    nb, bs = 64, 2
    rows, cols, blocks = [], [], []
    for o in (-8, -1, 0, 1, 8):
        for i in range(max(0, -o), min(nb, nb - o)):
            rows.append(i); cols.append(i + o)
            blocks.append(rng.standard_normal((bs, bs)) * 0.2
                          + (np.eye(bs) * 4 if o == 0 else 0))
    order = np.lexsort((cols, rows))
    rowptr = np.searchsorted(np.asarray(rows)[order], np.arange(nb + 1))
    B = BSRMatrix.from_arrays(rowptr.astype(np.int32),
                              np.asarray(cols)[order].astype(np.int32),
                              np.stack([blocks[i] for i in order]), bs)
    bb = B.to_scipy() @ np.ones(B.nrows)
    x, info, ctx = solve(
        B, bb, {"blasted_pc_type": "ilu0", "blasted_async_sweeps": "4,4",
                "blasted_compute_preconditioner_info": "1",
                "rtol": 1e-9, "maxiter": 500}, mesh=make_mesh(4))
    assert bool(info.converged)
    assert isinstance(ctx.prec, DistBlockDiaSolver)
    assert len(ctx.infolist) == 1
    assert float(ctx.infolist[0].prec_remainder_norm) > 0.0
