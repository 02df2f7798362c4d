"""Pallas block-DIA stencil kernels vs the SoA oracles (Pallas interpreter
on CPU — the same kernel logic that runs on chip; see test_stencil.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from blasted_tpu.ops.bdia import bdia_spmv
from blasted_tpu.ops.bstencil import (
    bdia_factor_u0_sweep_stencil,
    bdia_spmv_stencil_cols,
    stack_factor_coeffs,
    stack_spmv_coeffs,
)
from blasted_tpu.ops.stencil import pad_vec, stencil_plan, unpad_vec
from blasted_tpu.precond.bdia_ilu0 import (
    _soa_gj_inverse,
    bdia_factor_sweeps_soa,
)
from blasted_tpu.precond.dia_ilu0 import dia_pairs
from blasted_tpu.sparse.bdia import BlockDiaMatrix


def _block_band(g, bs, seed=0):
    nb = g ** 3
    offsets = (-g * g, -g, -1, 0, 1, g, g * g)
    k = len(offsets)
    idx = np.arange(nb)
    i0, j0, k0 = idx % g, (idx // g) % g, idx // (g * g)
    mask_np = np.stack([k0 > 0, j0 > 0, i0 > 0, np.ones(nb, bool),
                        i0 < g - 1, j0 < g - 1, k0 < g - 1])
    rng = np.random.default_rng(seed)
    data = []
    for d in range(k):
        comp = []
        for i in range(bs):
            for j in range(bs):
                v = 0.25 * rng.standard_normal(nb)
                if offsets[d] == 0 and i == j:
                    v = v + 2.0 * k
                comp.append(jnp.asarray(
                    np.where(mask_np[d], v, 0.0).astype(np.float32)))
        data.append(tuple(comp))
    mask = tuple(jnp.asarray(mask_np[d]) for d in range(k))
    return BlockDiaMatrix(data=tuple(data), mask=mask, offsets=offsets)


def test_bstencil_spmv_matches_soa():
    g, bs = 16, 4
    A = _block_band(g, bs)
    nb = A.nbrows
    T, _ = stencil_plan(A.offsets, nb)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((nb, bs)),
                    dtype=jnp.float32)
    C = stack_spmv_coeffs(A.offsets, A.data, bs)
    xps = tuple(pad_vec(x[:, j], T) for j in range(bs))
    outs = bdia_spmv_stencil_cols(A.offsets, C, xps, T)
    # padded-frame contract: pad tiles exactly zero
    for o in outs:
        np.testing.assert_array_equal(np.asarray(o[:T]), 0.0)
        np.testing.assert_array_equal(np.asarray(o[-T:]), 0.0)
    y = np.stack([np.asarray(unpad_vec(o, T)) for o in outs], axis=1)
    yref = np.asarray(bdia_spmv(A, x))
    np.testing.assert_allclose(y, yref, rtol=3e-5, atol=3e-5)


def test_bstencil_factor_u0_sweep_matches_compressed_step():
    """One kernel sweep == one substituted update F(u0) computed with the
    plain SoA ops (the compressed chain's step; bdia_ilu0)."""
    from blasted_tpu.precond.bdia_ilu0 import _soa_bmm

    g, bs = 16, 3
    A = _block_band(g, bs, seed=5)
    nb = A.nbrows
    offsets = A.offsets
    d0 = offsets.index(0)
    pairs = dia_pairs(offsets)
    pairs_key = [tuple(p) for p in pairs[d0]]
    pair_offs = tuple(o1 for (_, _, o1) in pairs_key)
    T, _ = stencil_plan(offsets, nb)
    base_t = tuple(tuple(c for c in comp) for comp in A.data)

    from blasted_tpu.ops.stencil import pad_vec as pv

    C = stack_factor_coeffs(pairs_key, d0, base_t, A.data, bs)
    u0 = A.data[d0]
    dinv = _soa_gj_inverse(u0, bs, A.mask[d0])
    dinvp = tuple(pv(c, T) for c in dinv)
    outp = bdia_factor_u0_sweep_stencil(pair_offs, C, dinvp, bs, T)
    got = [np.asarray(o[T:-T]) for o in outp]

    # oracle: u0' = base0 − Σ_p (base_l·dinv[·+o1])·ub_pre
    from blasted_tpu.sparse.dia import shift_read
    want = [np.asarray(c) for c in base_t[d0]]
    for (dl, du, o1) in pairs_key:
        low = _soa_bmm(base_t[dl], dinv, bs, shift=o1)
        ub_pre = [shift_read(c, o1) for c in base_t[du]]
        prod = _soa_bmm(low, ub_pre, bs)
        want = [w - np.asarray(p) for w, p in zip(want, prod)]
    for r in range(bs * bs):
        np.testing.assert_allclose(got[r], want[r], rtol=3e-5, atol=3e-5)


def test_bstencil_factor_dinv_sweep_fuses_gj():
    """The production per-sweep kernel (out_dinv=True) == contraction then
    batched pivoted GJ, computed with the plain SoA ops."""
    from blasted_tpu.ops.bstencil import (
        bdia_factor_dinv_sweep_stencil,
        gj_inverse_rows,
    )
    from blasted_tpu.ops.stencil import pad_vec as pv
    from blasted_tpu.precond.bdia_ilu0 import _soa_bmm
    from blasted_tpu.sparse.dia import shift_read

    g, bs = 16, 4
    A = _block_band(g, bs, seed=11)
    offsets = A.offsets
    d0 = offsets.index(0)
    pairs = dia_pairs(offsets)
    pairs_key = [tuple(p) for p in pairs[d0]]
    pair_offs = tuple(o1 for (_, _, o1) in pairs_key)
    T, _ = stencil_plan(offsets, A.nbrows)
    base_t = tuple(tuple(c for c in comp) for comp in A.data)

    C = stack_factor_coeffs(pairs_key, d0, base_t, A.data, bs)
    dinv = _soa_gj_inverse(A.data[d0], bs, A.mask[d0])
    dinvp = tuple(pv(c, T) for c in dinv)
    outp = bdia_factor_dinv_sweep_stencil(pair_offs, C, dinvp, bs, T)
    # pad tiles of the Dinv streams must stay exactly zero (the next
    # sweep's halo window reads them as the out-of-range shift fill)
    for o in outp:
        np.testing.assert_array_equal(np.asarray(o[:T]), 0.0)
        np.testing.assert_array_equal(np.asarray(o[-T:]), 0.0)
    got = [np.asarray(o[T:-T]) for o in outp]

    # oracle: Dinv' = GJ(u0') with u0' = base0 − Σ_p (base_l·dinv[·+o1])·ub
    u0n = [np.asarray(c) for c in base_t[d0]]
    for (dl, du, o1) in pairs_key:
        low = _soa_bmm(base_t[dl], dinv, bs, shift=o1)
        ub_pre = [shift_read(c, o1) for c in base_t[du]]
        prod = _soa_bmm(low, ub_pre, bs)
        u0n = [w - np.asarray(p) for w, p in zip(u0n, prod)]
    want = gj_inverse_rows([jnp.asarray(r) for r in u0n], bs)
    for r in range(bs * bs):
        np.testing.assert_allclose(got[r], np.asarray(want[r]),
                                   rtol=3e-5, atol=3e-5)


def test_bstencil_factor_chunk_not_dividing_preferred():
    """T a multiple of 1024 but NOT of the preferred 2048-lane chunk
    (bs=5 g=48's T=3072 exposed a chunk/tile shape mismatch on chip): the
    kernel must fall back to a dividing chunk and stay exact."""
    from blasted_tpu.ops.bstencil import (
        _FCH,
        bdia_factor_dinv_sweep_stencil,
        gj_inverse_rows,
        stack_factor_coeffs,
    )
    from blasted_tpu.ops.stencil import pad_vec, stencil_plan
    from blasted_tpu.precond.bdia_ilu0 import _soa_bmm, _soa_gj_inverse
    from blasted_tpu.sparse.dia import shift_read

    bs = 2
    offsets = (-2500, -1, 0, 1, 2500)
    nb = 6144
    T, nt = stencil_plan(offsets, nb)
    assert T == 3072 and T % _FCH != 0   # the regression precondition
    rng = np.random.default_rng(2)
    data = []
    for d in range(len(offsets)):
        comp = []
        for i in range(bs):
            for j in range(bs):
                v = 0.25 * rng.standard_normal(nb)
                if offsets[d] == 0 and i == j:
                    v = v + 4.0
                comp.append(jnp.asarray(v, dtype=jnp.float32))
        data.append(tuple(comp))
    data = tuple(data)
    mask_full = jnp.ones((nb,), bool)
    pairs = dia_pairs(offsets)
    d0 = offsets.index(0)
    pairs_key = [tuple(p) for p in pairs[d0]]
    pair_offs = tuple(o1 for (_, _, o1) in pairs_key)

    C = stack_factor_coeffs(pairs_key, d0, data, data, bs)
    dinv = _soa_gj_inverse(data[d0], bs, mask_full)
    outp = bdia_factor_dinv_sweep_stencil(
        pair_offs, C, tuple(pad_vec(c, T) for c in dinv), bs, T)
    got = [np.asarray(o[T:-T]) for o in outp]

    u0n = [np.asarray(c) for c in data[d0]]
    for (dl, du, o1) in pairs_key:
        low = _soa_bmm(data[dl], dinv, bs, shift=o1)
        ub_pre = [shift_read(c, o1) for c in data[du]]
        prod = _soa_bmm(low, ub_pre, bs)
        u0n = [w - np.asarray(p) for w, p in zip(u0n, prod)]
    want = gj_inverse_rows([jnp.asarray(r) for r in u0n], bs)
    for r in range(bs * bs):
        np.testing.assert_allclose(got[r], np.asarray(want[r]),
                                   rtol=3e-5, atol=3e-5)


def test_gj_inverse_rows_matches_numpy():
    """Shared GJ helper (first-max where-chain pivoting) vs numpy.linalg.inv
    on random well- and badly-scaled blocks."""
    from blasted_tpu.ops.bstencil import gj_inverse_rows

    rng = np.random.default_rng(3)
    for bs in (2, 3, 4, 5):
        n = 257
        blocks = rng.standard_normal((n, bs, bs))
        blocks += np.eye(bs) * 2.0 * bs
        blocks[::3] *= 1e3          # scale spread exercises the pivoting
        rows = [jnp.asarray(blocks[:, i, j], dtype=jnp.float64)
                for i in range(bs) for j in range(bs)]
        out = gj_inverse_rows(rows, bs)
        got = np.stack([np.asarray(c) for c in out]).reshape(bs, bs, n)
        want = np.linalg.inv(blocks)
        np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                                   rtol=1e-9, atol=1e-9)


def test_bstencil_route_static_under_jit(monkeypatch):
    """VERDICT r4 #5: with the host-resolved static flag passed through,
    the compressed factor takes the Pallas stencil route even when the mask
    is TRACED (jit/shard_map — the distributed setup path); without it the
    traced-mask fallback must keep the safe XLA route."""
    import blasted_tpu.ops.bstencil as bst
    import blasted_tpu.precond.bdia_ilu0 as bi

    g, bs = 16, 3
    A = _block_band(g, bs, seed=13)
    offsets = A.offsets
    d0 = offsets.index(0)
    pairs = dia_pairs(offsets)
    T, nt = stencil_plan(offsets, A.nbrows)
    calls = []
    orig_dinv = bst.bdia_factor_dinv_sweep_stencil

    monkeypatch.setattr(bst, "bstencil_gate", lambda *a, **k: (T, nt))
    monkeypatch.setattr(
        bst, "bdia_factor_dinv_sweep_stencil",
        lambda *a, **k: calls.append("dinv") or orig_dinv(*a, **k))

    @jax.jit
    def build(mask, data):       # mask/data traced, flag static
        return bi.bdia_factor_sweeps_compressed(
            offsets, pairs, d0, mask, data, data, 2, diag_mask_full=True)

    out = build(A.mask, A.data)
    assert calls == ["dinv"], "static flag must select the stencil route"
    ref = bdia_factor_sweeps_soa(offsets, pairs, d0, A.mask,
                                 A.data, A.data, 4)
    for c in range(bs * bs):
        np.testing.assert_allclose(np.asarray(out[d0][c]),
                                   np.asarray(ref[d0][c]),
                                   rtol=3e-5, atol=3e-5)

    calls.clear()

    @jax.jit
    def build_unknown(mask, data):   # traced mask, no flag → safe fallback
        return bi.bdia_factor_sweeps_compressed(
            offsets, pairs, d0, mask, data, data, 2)

    build_unknown(A.mask, A.data)
    assert calls == [], "traced mask without the flag must stay on XLA"


def test_bdia_container_static_flag():
    """bdia_from_bsr stamps the host-computed diag_mask_full; padding and
    value updates preserve it; the preconditioner resolves it eagerly."""
    from blasted_tpu.precond.bdia_ilu0 import BlockDiaILU0Preconditioner
    from blasted_tpu.sparse.bdia import bdia_from_bsr, bdia_pad_identity
    from blasted_tpu.sparse.bsr import BSRMatrix

    rng = np.random.default_rng(0)
    nb, bs = 12, 3
    rows, cols, blocks = [], [], []
    for i in range(nb):
        for j in (i - 1, i, i + 1):
            if 0 <= j < nb:
                rows.append(i)
                cols.append(j)
                blk = 0.2 * rng.standard_normal((bs, bs))
                if i == j:
                    blk += np.eye(bs) * 3.0
                blocks.append(blk)
    rp = np.zeros(nb + 1, dtype=np.int32)
    np.add.at(rp[1:], np.asarray(rows), 1)
    B = BSRMatrix.from_arrays(np.cumsum(rp, dtype=np.int32),
                              np.asarray(cols, dtype=np.int32),
                              np.stack(blocks), bs)
    A = bdia_from_bsr(B)
    assert A.diag_mask_full is True
    assert bdia_pad_identity(A, 16).diag_mask_full is True
    assert A.with_new_data(A.data).diag_mask_full is True
    prec = BlockDiaILU0Preconditioner(A, nbuildsweeps=2, napplysweeps=2)
    assert prec._diag_mask_full is True


def test_bstencil_full_compressed_chain_on_interpreter():
    """Drive the production compressed chain through the stencil kernel by
    monkeypatching the gate (CPU interpreter), and check the 2K/2K−1
    characterisation against plain SoA sweeps."""
    import blasted_tpu.ops.bstencil as bst
    import blasted_tpu.precond.bdia_ilu0 as bi

    g, bs = 16, 4
    A = _block_band(g, bs, seed=9)
    offsets = A.offsets
    d0 = offsets.index(0)
    pairs = dia_pairs(offsets)
    T, nt = stencil_plan(offsets, A.nbrows)

    orig = bst.bstencil_gate
    bst.bstencil_gate = lambda *a, **k: (T, nt)
    try:
        K = 2
        comp = bi.bdia_factor_sweeps_compressed(offsets, pairs, d0, A.mask,
                                                A.data, A.data, K)
    finally:
        bst.bstencil_gate = orig
    ref = {s: bdia_factor_sweeps_soa(offsets, pairs, d0, A.mask,
                                     A.data, A.data, s)
           for s in (2 * K - 1, 2 * K)}
    for d, o in enumerate(offsets):
        want = ref[2 * K][d] if o >= 0 else ref[2 * K - 1][d]
        for c in range(bs * bs):
            np.testing.assert_allclose(np.asarray(comp[d][c]),
                                       np.asarray(want[c]),
                                       rtol=3e-5, atol=3e-5)
