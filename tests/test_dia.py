"""DIA (banded fast path) format-parity tests: every kernel and operator must
match its padded-CSR counterpart exactly (same pattern, same math)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blasted_tpu import AsyncSolverSettings, PrecType, SEQUENTIAL, create_preconditioner
from blasted_tpu.apps import poisson3d_system
from blasted_tpu.factory import to_device_matrix
from blasted_tpu.ops.spmv import spmv
from blasted_tpu.ops.sweeps import lower_mv, upper_mv
from blasted_tpu.precond.dia_ilu0 import DiaILU0Preconditioner
from blasted_tpu.precond.ilu0 import ILU0Preconditioner
from blasted_tpu.solvers import bicgstab
from blasted_tpu.sparse.dia import dia_from_csr, try_dia_from_csr
from helpers import exact_ilu0_oracle, random_csr


@pytest.fixture(scope="module")
def poisson():
    A, b, _ = poisson3d_system((9, 9, 9), dist="chebyshev")
    return A, b


def test_dia_roundtrip(poisson):
    A, _ = poisson
    D = dia_from_csr(A)
    np.testing.assert_allclose(D.to_scipy().toarray(), A.to_scipy().toarray())
    assert D.nnz == A.nnz
    assert 0 in D.offsets


def test_try_dia_detection(poisson):
    A, _ = poisson
    assert try_dia_from_csr(A) is not None          # 7 diagonals
    R = random_csr(80, density=0.3, seed=0)
    assert try_dia_from_csr(R, max_diags=16) is None  # too many offsets


def test_dia_spmv_matches_csr(poisson):
    A, _ = poisson
    D = dia_from_csr(A)
    P = A.pad()
    x = np.random.default_rng(0).standard_normal(A.nrows)
    np.testing.assert_allclose(np.asarray(spmv(D, jnp.asarray(x))),
                               np.asarray(spmv(P, jnp.asarray(x))),
                               rtol=1e-13, atol=1e-13)


def test_dia_triangular_mv_matches_csr(poisson):
    A, _ = poisson
    D = dia_from_csr(A)
    P = A.pad()
    x = jnp.asarray(np.random.default_rng(1).standard_normal(A.nrows))
    np.testing.assert_allclose(np.asarray(lower_mv(D, D.vals_pad, x)),
                               np.asarray(lower_mv(P, P.vals_pad, x)),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(upper_mv(D, D.vals_pad, x)),
                               np.asarray(upper_mv(P, P.vals_pad, x)),
                               rtol=1e-13, atol=1e-13)


def test_dia_exact_ilu0_matches_oracle(poisson):
    """DIA exact factorization == sequential IKJ oracle on the CSR pattern
    (structural-mask pattern parity)."""
    A, _ = poisson
    D = dia_from_csr(A)
    p = DiaILU0Preconditioner(D, nbuildsweeps=SEQUENTIAL,
                              napplysweeps=SEQUENTIAL)
    p.compute()
    ref = exact_ilu0_oracle(A)
    # scatter oracle values into DIA layout for comparison
    got = np.asarray(p.state.ilu)
    ref_dia = np.asarray(dia_from_csr(A.with_vals(jnp.asarray(ref))).data)
    np.testing.assert_allclose(got, ref_dia, rtol=1e-12, atol=1e-13)


def test_dia_ilu0_sweeps_match_csr_sweeps(poisson):
    """k factor sweeps in DIA == k factor sweeps in CSR (same fixed point
    iteration, different storage)."""
    A, _ = poisson
    D = dia_from_csr(A)
    for ns in (1, 3):
        pd = DiaILU0Preconditioner(D, nbuildsweeps=ns, napplysweeps=2)
        pd.compute()
        pc = ILU0Preconditioner(A.pad(), nbuildsweeps=ns, napplysweeps=2)
        pc.compute()
        ref_dia = np.asarray(
            dia_from_csr(A.with_vals(pc.state.ilu)).data)
        np.testing.assert_allclose(np.asarray(pd.state.ilu), ref_dia,
                                   rtol=1e-12, atol=1e-13)
        # applies agree too
        r = np.random.default_rng(ns).standard_normal(A.nrows)
        np.testing.assert_allclose(np.asarray(pd.apply(jnp.asarray(r))),
                                   np.asarray(pc.apply(jnp.asarray(r))),
                                   rtol=1e-12, atol=1e-12)


def test_dia_scaled_ilu0_matches_csr(poisson):
    A, _ = poisson
    D = dia_from_csr(A)
    pd = DiaILU0Preconditioner(D, nbuildsweeps=4, napplysweeps=3,
                               use_scaling=True)
    pd.compute()
    pc = ILU0Preconditioner(A.pad(), nbuildsweeps=4, napplysweeps=3,
                            use_scaling=True)
    pc.compute()
    r = np.random.default_rng(7).standard_normal(A.nrows)
    np.testing.assert_allclose(np.asarray(pd.apply(jnp.asarray(r))),
                               np.asarray(pc.apply(jnp.asarray(r))),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("name", ["jacobi", "sgs", "gs", "level_sgs", "cscbgs"])
def test_dia_other_precs_match_csr(poisson, name):
    """All scalar operators work on DIA through kernel dispatch and match CSR."""
    A, _ = poisson
    D = dia_from_csr(A)
    settings = AsyncSolverSettings(prec_type=PrecType(name),
                                   nbuildsweeps=3, napplysweeps=3)
    pd = create_preconditioner(D, settings)
    pd.compute()
    pc = create_preconditioner(A.pad(), settings)
    pc.compute()
    r = np.random.default_rng(3).standard_normal(A.nrows)
    np.testing.assert_allclose(np.asarray(pd.apply(jnp.asarray(r))),
                               np.asarray(pc.apply(jnp.asarray(r))),
                               rtol=1e-11, atol=1e-11)


def test_dia_end_to_end_solve(poisson):
    A, b = poisson
    xref = np.linalg.solve(A.to_scipy().toarray(), b)
    D = to_device_matrix(A)
    from blasted_tpu.sparse.dia import DiaMatrix
    assert isinstance(D, DiaMatrix)
    prec = create_preconditioner(
        D, AsyncSolverSettings(prec_type=PrecType.ILU0,
                               nbuildsweeps=4, napplysweeps=4))
    prec.compute()
    x, info = bicgstab(lambda v: spmv(D, v), prec.apply_flat,
                       jnp.asarray(b), jnp.zeros(A.nrows, dtype=jnp.float64),
                       tol=1e-10, maxiter=600)
    assert bool(info.converged)
    err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
    assert err < 1e-7


def test_dia_ilu0_bf16_apply(poisson):
    """Mixed-precision preconditioner storage: bf16 factors must still
    precondition effectively (iterations within 2x of the f64 path)."""
    A, b = poisson
    D = dia_from_csr(A)
    xref = np.linalg.solve(A.to_scipy().toarray(), b)

    def run(dtype):
        p = DiaILU0Preconditioner(D, nbuildsweeps=4, napplysweeps=4,
                                  apply_dtype=dtype)
        p.compute()
        x, info = bicgstab(lambda v: spmv(D, v), p.apply_flat,
                           jnp.asarray(b), jnp.zeros(A.nrows, jnp.float64),
                           tol=1e-10, maxiter=2000)
        assert bool(info.converged)
        err = np.abs(np.asarray(x) - xref).max() / np.abs(xref).max()
        assert err < 1e-6
        return int(info.iters)

    it_full = run(None)
    it_bf16 = run(jnp.bfloat16)
    assert it_bf16 <= max(2 * it_full, it_full + 10)
