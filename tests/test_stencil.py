"""Pallas DIA-stencil kernels vs the XLA shifted-FMA oracles.

The stencil kernels (ops/stencil.py) exist because XLA's fused shifted
reads fall off a locality cliff for halos past ~0.5 MB on real TPUs; on CPU
they run through the Pallas interpreter, so these tests check the exact
same kernel logic (halo-ring DMA protocol, padded-frame chaining) that runs
on the chip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blasted_tpu.ops.dia import dia_spmv
from blasted_tpu.ops.stencil import (
    dia_factor_sweeps_stencil,
    dia_spmv_stencil,
    factor_stencil_eligible,
    pad_vec,
    stencil_plan,
    unpad_vec,
)
from blasted_tpu.precond.dia_ilu0 import dia_factor_sweep_tuple, dia_pairs
from blasted_tpu.sparse.dia import DiaMatrix


def _poisson_band(g, dtype=jnp.float32, seed=0):
    n = g ** 3
    offsets = (-g * g, -g, -1, 0, 1, g, g * g)
    k = len(offsets)
    rng = np.random.default_rng(seed)
    idx = np.arange(n)
    i0, j0, k0 = idx % g, (idx // g) % g, idx // (g * g)
    mask_np = np.stack([k0 > 0, j0 > 0, i0 > 0, np.ones(n, bool),
                        i0 < g - 1, j0 < g - 1, k0 < g - 1])
    data = []
    for d in range(k):
        v = 0.25 * rng.standard_normal(n)
        if offsets[d] == 0:
            v = v + 2.0 * k
        data.append(jnp.asarray(np.where(mask_np[d], v, 0.0), dtype=dtype))
    mask = tuple(jnp.asarray(mask_np[d]) for d in range(k))
    return DiaMatrix(data=tuple(data), mask=mask, offsets=offsets)


def test_stencil_plan_eligibility():
    offs = (-256, -16, -1, 0, 1, 16, 256)
    plan = stencil_plan(offs, 16 ** 3)
    assert plan is not None
    T, nt = plan
    assert T % 1024 == 0 and T >= 256 and nt * T == 16 ** 3
    # diagonal-only band has no halo -> ineligible
    assert stencil_plan((0,), 16 ** 3) is None
    # a band too wide for the VMEM budget -> ineligible
    assert stencil_plan(tuple(range(-1_000_000, 1_000_001, 100_000)),
                        64_000_000) is None


def test_stencil_spmv_matches_xla():
    g = 16
    D = _poisson_band(g)
    n = D.nrows
    T, _ = stencil_plan(D.offsets, n)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                    dtype=jnp.float32)
    yp = dia_spmv_stencil(D.offsets, D.data, pad_vec(x, T), T)
    # pad region must be exactly zero (padded-frame contract)
    np.testing.assert_array_equal(np.asarray(yp[:T]), 0.0)
    np.testing.assert_array_equal(np.asarray(yp[-T:]), 0.0)
    y = unpad_vec(yp, T)
    yref = dia_spmv(D, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=2e-6, atol=2e-6)


def test_stencil_spmv_chained_padded_frame():
    """Chained applications in the padded frame equal chained XLA SpMVs."""
    g = 16
    D = _poisson_band(g, seed=3)
    n = D.nrows
    T, _ = stencil_plan(D.offsets, n)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(n),
                    dtype=jnp.float32)
    c = jnp.float32(1.0 / 28.0)

    @jax.jit
    def chain_stencil(data, xp):
        def body(i, v):
            return dia_spmv_stencil(D.offsets, data, v, T) * c
        return jax.lax.fori_loop(0, 3, body, xp)

    yp = chain_stencil(D.data, pad_vec(x, T))
    y = unpad_vec(yp, T)
    yref = x
    for _ in range(3):
        yref = dia_spmv(D, yref) * c
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=2e-5, atol=2e-5)


def test_stencil_factor_matches_tuple_sweep():
    """The compressed (substituted) stencil sweep chain against the plain
    Jacobi tuple sweeps.  One stencil sweep applies the substituted update
    u0' = base0 − Σ (base_l/guard(u0))·ub — the contraction of TWO plain
    sweeps — so after K stencil sweeps the main diagonal equals the plain
    chain's u0 after 2K sweeps, and the returned lowers (computed from the
    second-to-last u0 iterate) equal the plain chain's lowers after 2K−1
    sweeps.  Exact characterisation, not an approximate comparison."""
    g = 16
    D = _poisson_band(g, seed=5)
    n = D.nrows
    offsets = D.offsets
    k = len(offsets)
    pairs = dia_pairs(offsets)
    d0 = offsets.index(0)
    assert factor_stencil_eligible(offsets, pairs)
    T, _ = stencil_plan(offsets, n, extra_streams=6)
    nsweeps = 3

    ilu_st = dia_factor_sweeps_stencil(offsets, pairs, d0, D.data, D.data,
                                       nsweeps, T)

    mask_t = [None] * k          # d0 all-true; lowers guarded; uppers pass
    ref = {0: tuple(D.data)}
    for s in range(1, 2 * nsweeps + 1):
        ref[s] = dia_factor_sweep_tuple(offsets, pairs, d0, mask_t,
                                        D.data, ref[s - 1])
    for d, o in enumerate(offsets):
        want = ref[2 * nsweeps][d] if o >= 0 else ref[2 * nsweeps - 1][d]
        np.testing.assert_allclose(np.asarray(ilu_st[d]), np.asarray(want),
                                   rtol=5e-6, atol=5e-6)


def test_stencil_factor_fixed_point():
    """The exact ILU factors are a fixed point of the stencil sweep (the
    reference's strongest convergence property, async_ilu_convergence.cpp
    :34-140 — exact factors must not drift)."""
    g = 16
    D = _poisson_band(g, seed=7)
    offsets, n = D.offsets, D.nrows
    pairs = dia_pairs(offsets)
    d0 = offsets.index(0)
    plan = stencil_plan(offsets, n, extra_streams=6)
    if plan is None:
        pytest.skip("band below stencil threshold at this size")
    T, _ = plan
    # converge with the XLA sweep, then one stencil sweep must not move it
    mask_t = [None] * len(offsets)
    ilu = tuple(D.data)
    for _ in range(60):
        ilu = dia_factor_sweep_tuple(offsets, pairs, d0, mask_t, D.data, ilu)
    out = dia_factor_sweeps_stencil(offsets, pairs, d0, D.data, ilu, 1, T)
    for d in range(len(offsets)):
        np.testing.assert_allclose(np.asarray(out[d]), np.asarray(ilu[d]),
                                   rtol=1e-5, atol=1e-5)


def test_stencil_triangular_sweeps_match_xla():
    from blasted_tpu.ops.stencil import (
        unit_lower_sweep_stencil,
        upper_solve_sweep_stencil,
    )
    from blasted_tpu.ops.sweeps import unit_lower_sweep, upper_solve_sweep

    g = 16
    D = _poisson_band(g, seed=9)
    n = D.nrows
    offsets = D.offsets
    T, _ = stencil_plan(offsets, n)
    rng = np.random.default_rng(9)
    z = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    dinv = 1.0 / D.data[offsets.index(0)]

    # three chained pairs (padded frame) vs the XLA sweeps
    yp = pad_vec(jnp.zeros(n, jnp.float32), T)
    y = jnp.zeros(n, jnp.float32)
    for _ in range(3):
        y1p = unit_lower_sweep_stencil(offsets, D.data, z, yp, T)
        yp = upper_solve_sweep_stencil(offsets, D.data, dinv, z, y1p, T)
        y1 = unit_lower_sweep(D, D.data, z, y)
        y = upper_solve_sweep(D, D.data, dinv, z, y1)
    np.testing.assert_allclose(np.asarray(unpad_vec(yp, T)), np.asarray(y),
                               rtol=2e-5, atol=2e-5)
