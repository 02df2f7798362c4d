"""Preconditioner operator tests vs dense/sequential oracles.

Covers the reference's solverops test strategy (SURVEY.md §4.6, reference
tests/solverops/): exact paths match sequential oracles to machine precision;
sweep paths converge monotonically to the exact fixed point; exact values are
a fixed point of the sweep iteration.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from blasted_tpu import AsyncSolverSettings, PrecType, SEQUENTIAL, create_preconditioner
from blasted_tpu.config import ApplyInit, FactInit
from blasted_tpu.precond import (
    BJacobiPreconditioner,
    BlockILU0Preconditioner,
    BlockLevelSGSPreconditioner,
    BSGSPreconditioner,
    CSCBGSPreconditioner,
    ILU0Preconditioner,
    JacobiPreconditioner,
    LevelSGSPreconditioner,
    SGSPreconditioner,
)
from helpers import (
    exact_block_ilu0_oracle,
    exact_ilu0_oracle,
    ilu0_solve_oracle,
    random_bsr,
    random_csr,
)

N = 60


def _dense_sgs_apply(A, r):
    """Exact (D+L) D⁻¹ (D+U) z = r via dense triangular solves."""
    dense = A.toarray()
    D = np.diag(np.diag(dense))
    L = np.tril(dense, -1)
    U = np.triu(dense, 1)
    y = np.linalg.solve(D + L, r)
    return np.linalg.solve(D + U, D @ y)


def test_jacobi_apply():
    A = random_csr(N, seed=0)
    p = JacobiPreconditioner(A.pad())
    p.compute()
    r = np.random.default_rng(0).standard_normal(N)
    z = np.asarray(p.apply(jnp.asarray(r)))
    d = np.asarray(A.vals)[np.asarray(A.diagind)]
    np.testing.assert_allclose(z, r / d, rtol=1e-14)


def test_block_jacobi_apply():
    bs = 4
    B = random_bsr(10, bs, seed=1)
    p = BJacobiPreconditioner(B.pad())
    p.compute()
    r = np.random.default_rng(1).standard_normal(B.nrows)
    z = np.asarray(p.apply(jnp.asarray(r.reshape(-1, bs)))).reshape(-1)
    dense = B.to_scipy().toarray()
    ref = np.zeros_like(r)
    for i in range(10):
        blk = dense[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
        ref[i * bs:(i + 1) * bs] = np.linalg.solve(blk, r[i * bs:(i + 1) * bs])
    np.testing.assert_allclose(z, ref, rtol=1e-12, atol=1e-12)


def test_level_sgs_is_exact():
    """Level-scheduled SGS == dense SGS solve to machine precision
    (the analogue of the reference's 1-thread issame tests)."""
    A = random_csr(N, density=0.08, seed=2)
    p = LevelSGSPreconditioner(A.pad())
    p.compute()
    r = np.random.default_rng(2).standard_normal(N)
    z = np.asarray(p.apply(jnp.asarray(r)))
    ref = _dense_sgs_apply(A.to_scipy(), r)
    np.testing.assert_allclose(z, ref, rtol=1e-12, atol=1e-12)


def test_sgs_sweeps_converge_to_exact():
    """Sweep-SGS → exact SGS as napplysweeps grows (reference: async
    triangular solve convergence, tests/solverops)."""
    A = random_csr(N, density=0.08, seed=3)
    r = np.random.default_rng(3).standard_normal(N)
    ref = _dense_sgs_apply(A.to_scipy(), r)
    errs = []
    for ns in (2, 6, 20, 60):
        p = SGSPreconditioner(A.pad(), napplysweeps=ns,
                              apply_init=ApplyInit.ZERO)
        p.compute()
        z = np.asarray(p.apply(jnp.asarray(r)))
        errs.append(np.abs(z - ref).max())
    assert errs[-1] < 1e-10
    assert errs[0] > errs[1] > errs[2]


def test_block_level_sgs_exact():
    bs = 3
    B = random_bsr(12, bs, density=0.25, seed=4)
    p = BlockLevelSGSPreconditioner(B.pad())
    p.compute()
    n = B.nrows
    r = np.random.default_rng(4).standard_normal(n)
    z = np.asarray(p.apply(jnp.asarray(r.reshape(-1, bs)))).reshape(-1)
    # dense block-SGS oracle
    dense = B.to_scipy().toarray()
    Db = np.zeros_like(dense)
    for i in range(12):
        Db[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs] = \
            dense[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
    Lb = np.zeros_like(dense)
    Ub = np.zeros_like(dense)
    for i in range(12):
        Lb[i * bs:(i + 1) * bs, : i * bs] = dense[i * bs:(i + 1) * bs, : i * bs]
        Ub[i * bs:(i + 1) * bs, (i + 1) * bs:] = dense[i * bs:(i + 1) * bs, (i + 1) * bs:]
    y = np.linalg.solve(Db + Lb, r)
    ref = np.linalg.solve(Db + Ub, Db @ y)
    np.testing.assert_allclose(z, ref, rtol=1e-11, atol=1e-11)


def test_cscbgs_matches_backward_gs():
    A = random_csr(N, density=0.08, seed=5)
    r = np.random.default_rng(5).standard_normal(N)
    dense = A.to_scipy().toarray()
    D = np.diag(np.diag(dense))
    U = np.triu(dense, 1)
    ref = np.linalg.solve(D + U, r)
    p = CSCBGSPreconditioner(A.pad(), napplysweeps=80)
    p.compute()
    z = np.asarray(p.apply(jnp.asarray(r)))
    np.testing.assert_allclose(z, ref, rtol=1e-10, atol=1e-10)


# ------------------------------------------------------------------ ILU0 ----

def test_exact_ilu0_matches_oracle():
    """SEQUENTIAL factorization == sequential IKJ ILU(0) oracle."""
    A = random_csr(N, density=0.08, seed=6)
    p = ILU0Preconditioner(A.pad(), nbuildsweeps=SEQUENTIAL,
                           napplysweeps=SEQUENTIAL)
    p.compute()
    ref = exact_ilu0_oracle(A)
    np.testing.assert_allclose(np.asarray(p.state.ilu), ref,
                               rtol=1e-12, atol=1e-13)


def test_exact_ilu0_apply_matches_oracle():
    A = random_csr(N, density=0.08, seed=7)
    p = ILU0Preconditioner(A.pad(), nbuildsweeps=SEQUENTIAL,
                           napplysweeps=SEQUENTIAL)
    p.compute()
    r = np.random.default_rng(7).standard_normal(N)
    z = np.asarray(p.apply(jnp.asarray(r)))
    ref = ilu0_solve_oracle(A, exact_ilu0_oracle(A), r)
    np.testing.assert_allclose(z, ref, rtol=1e-11, atol=1e-11)


def test_ilu0_factor_sweeps_converge():
    """L/U errors decrease with sweeps and reach the exact factors —
    the reference's async_ilu_convergence test (tests/solverops/
    async_ilu_convergence.cpp:34-140)."""
    A = random_csr(N, density=0.08, seed=8)
    ref = exact_ilu0_oracle(A)
    errs = []
    for ns in (1, 3, 8, 25):
        p = ILU0Preconditioner(A.pad(), nbuildsweeps=ns, napplysweeps=1)
        p.compute()
        errs.append(np.abs(np.asarray(p.state.ilu) - ref).max())
    assert errs[0] >= errs[1] >= errs[2] >= errs[3]
    assert errs[-1] < 1e-10


def test_exact_factors_are_fixed_point():
    """Starting from exact factors, sweeps do not drift
    (reference: exact factors stable within 5 sweeps at 1e-16)."""
    A = random_csr(N, density=0.08, seed=9)
    ref = exact_ilu0_oracle(A)
    p = ILU0Preconditioner(A.pad(), nbuildsweeps=5, napplysweeps=1)
    p._ensure_symbolic()
    base = p._scaled_vals(None)
    sweep = p._factor_sweep_fn(base)
    ilu = jnp.asarray(ref)
    for _ in range(5):
        ilu = sweep(ilu)
    np.testing.assert_allclose(np.asarray(ilu), ref, rtol=1e-13, atol=1e-14)


def test_ilu0_apply_sweeps_converge():
    """Sweep triangular solves → exact solve as napplysweeps grows
    (reference: async_triangular_factors_convergence.cpp)."""
    A = random_csr(N, density=0.08, seed=10)
    ref_ilu = exact_ilu0_oracle(A)
    r = np.random.default_rng(10).standard_normal(N)
    ref = ilu0_solve_oracle(A, ref_ilu, r)
    errs = []
    for ns in (2, 8, 30, 90):
        p = ILU0Preconditioner(A.pad(), nbuildsweeps=SEQUENTIAL,
                               napplysweeps=ns, apply_init=ApplyInit.ZERO)
        p.compute()
        z = np.asarray(p.apply(jnp.asarray(r)))
        errs.append(np.abs(z - ref).max())
    assert errs[-1] < 1e-9
    assert errs[0] > errs[-1]


def test_ilu0_scaled_variant():
    """Symmetric scaling: factorization of SAS applied as S·(LU)⁻¹·S·r."""
    A = random_csr(N, density=0.08, seed=11)
    p = ILU0Preconditioner(A.pad(), nbuildsweeps=SEQUENTIAL,
                           napplysweeps=SEQUENTIAL, use_scaling=True)
    p.compute()
    r = np.random.default_rng(11).standard_normal(N)
    z = np.asarray(p.apply(jnp.asarray(r)))

    s = 1.0 / np.sqrt(np.asarray(A.vals)[np.asarray(A.diagind)])
    S = sps.diags(s)
    As = (S @ A.to_scipy() @ S).tocsr()
    As.sort_indices()
    from blasted_tpu.sparse.csr import CSRMatrix
    As_m = CSRMatrix.from_scipy(As)
    ref_ilu = exact_ilu0_oracle(As_m)
    ref = s * ilu0_solve_oracle(As_m, ref_ilu, s * r)
    np.testing.assert_allclose(z, ref, rtol=1e-11, atol=1e-11)


def test_ilu0_sgs_init():
    """INIT_F_SGS initial guess: L'U' = (D+L)D⁻¹(D+U) at sweep 0
    (reference: async_ilu_factor.cpp fact_init_sgs, :107-133)."""
    A = random_csr(N, density=0.08, seed=12)
    p = ILU0Preconditioner(A.pad(), nbuildsweeps=0, napplysweeps=1,
                           fact_init=FactInit.SGS)
    p.compute()
    ilu = np.asarray(p.state.ilu)
    vals = np.asarray(A.vals)
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    diagind = np.asarray(A.diagind)
    d = vals[diagind]
    for i in range(N):
        for pp in range(rowptr[i], rowptr[i + 1]):
            c = colind[pp]
            if c < i:
                assert np.isclose(ilu[pp], vals[pp] / d[c])
            else:
                assert ilu[pp] == vals[pp]


@pytest.mark.parametrize("bs", [3, 4])
def test_block_ilu0_exact_matches_oracle(bs):
    B = random_bsr(12, bs, density=0.25, seed=13 + bs)
    p = BlockILU0Preconditioner(B.pad(), nbuildsweeps=SEQUENTIAL,
                                napplysweeps=SEQUENTIAL)
    p.compute()
    ref = exact_block_ilu0_oracle(B)
    np.testing.assert_allclose(np.asarray(p.state.ilu), ref,
                               rtol=1e-10, atol=1e-11)


def test_block_ilu0_sweeps_converge():
    bs = 4
    B = random_bsr(12, bs, density=0.25, seed=20)
    ref = exact_block_ilu0_oracle(B)
    errs = []
    for ns in (1, 4, 15):
        p = BlockILU0Preconditioner(B.pad(), nbuildsweeps=ns, napplysweeps=1)
        p.compute()
        errs.append(np.abs(np.asarray(p.state.ilu) - ref).max())
    assert errs[0] >= errs[-1]
    assert errs[-1] < 1e-8


def test_block_sgs_apply_converges():
    bs = 4
    B = random_bsr(12, bs, density=0.25, seed=21)
    p_exact = BlockLevelSGSPreconditioner(B.pad())
    p_exact.compute()
    n = B.nrows
    r = np.random.default_rng(21).standard_normal(n).reshape(-1, bs)
    ref = np.asarray(p_exact.apply(jnp.asarray(r)))
    p = BSGSPreconditioner(B.pad(), napplysweeps=40)
    p.compute()
    z = np.asarray(p.apply(jnp.asarray(r)))
    np.testing.assert_allclose(z, ref, rtol=1e-8, atol=1e-8)


def test_precinfo_remainder_decreases():
    A = random_csr(N, density=0.08, seed=22)
    p = ILU0Preconditioner(A.pad(), nbuildsweeps=6, napplysweeps=1,
                           compute_precinfo=True)
    info = p.compute()
    assert float(info.prec_remainder_norm) < float(info.prec_rem_initial_norm)
    # near-zero remainder at the exact factors
    p2 = ILU0Preconditioner(A.pad(), nbuildsweeps=SEQUENTIAL, napplysweeps=1,
                            compute_precinfo=True)
    info2 = p2.compute()
    assert float(info2.prec_remainder_norm) < 1e-10


def test_inner_krylov_preconditioner():
    """PCKSP-leaf analogue (reference walker blasted_petsc.cpp:631-637):
    a bounded inner Richardson/ILU0 solve as the outer GCR's preconditioner
    must beat the bare leaf preconditioner's outer iteration count."""
    import jax.numpy as jnp

    from blasted_tpu import AsyncSolverSettings, PrecType, create_preconditioner
    from blasted_tpu.apps import poisson3d_system
    from blasted_tpu.ops.spmv import spmv
    from blasted_tpu.precond.inner import InnerKrylovPreconditioner
    from blasted_tpu.solvers import gcr

    A, b, _ = poisson3d_system((10, 10, 10), dist="chebyshev")
    P = A.pad()
    bj = jnp.asarray(np.asarray(b))

    def amat(v):
        return spmv(P, v)

    leaf = create_preconditioner(
        P, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=3, napplysweeps=3))
    leaf.compute()
    x_leaf, info_leaf = gcr(amat, leaf.apply_flat, bj, jnp.zeros_like(bj),
                            tol=1e-9, maxiter=300)

    inner = InnerKrylovPreconditioner(amat, leaf, method="richardson",
                                      inner_iters=4)
    inner.compute()
    x_in, info_in = gcr(amat, inner.apply_flat, bj, jnp.zeros_like(bj),
                        tol=1e-9, maxiter=300)

    sp = A.to_scipy()
    for x, info in ((x_leaf, info_leaf), (x_in, info_in)):
        assert bool(info.converged)
        r = sp @ np.asarray(x) - np.asarray(b)
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7
    # the nested stack does more work per apply -> far fewer outer iterations
    assert int(info_in.iters) < int(info_leaf.iters)

    with pytest.raises(NotImplementedError):
        inner.apply_relax(bj, bj)


def test_thread_chunk_size_knob_preserves_exact_factor():
    """P6 (dynamic work chunking): ``thread_chunk_size`` sets the exact-ILU
    slot chunk width (ilu_pattern.compute_fact_slots; reference:
    -blasted_thread_chunk_size, doc/user-doc.md:27) without changing the
    factorization — bit-identical to the auto-fitted chunking."""
    from helpers import exact_ilu0_oracle, random_csr

    A = random_csr(96, density=0.08, seed=21)
    oracle = exact_ilu0_oracle(A)

    ilus = {}
    for chunk in (0, 8, 64):
        p = create_preconditioner(A.pad(), AsyncSolverSettings(
            prec_type=PrecType.ILU0, nbuildsweeps=SEQUENTIAL,
            napplysweeps=SEQUENTIAL, thread_chunk_size=chunk))
        if chunk:
            assert p.thread_chunk_size == chunk
        p.compute()
        if chunk:
            assert p.symbolic.maxseg == chunk
        ilus[chunk] = np.asarray(p.state.ilu)
    np.testing.assert_array_equal(ilus[0], ilus[8])
    np.testing.assert_array_equal(ilus[0], ilus[64])
    # and the schedule itself reproduces the sequential IKJ factorization
    np.testing.assert_allclose(ilus[0], oracle, rtol=1e-12, atol=1e-13)
