"""Pallas block-DIA stencil kernels: explicit VMEM halo windows at block
sizes (the point-block analogue of ops/stencil.py).

Why: the XLA-fused SoA block kernels read the bs vector columns (SpMV) or
the bs² inverse-diagonal streams (factor) at ±H shifts; the shared on-chip
window those shifted reads need is bs (or bs²) TIMES the scalar one, so the
~0.5 MB fusion-locality budget is blown at much smaller halos — measured on
the real v5e at bs=4, g=128: fused bspmv 0.41 of the streaming roofline
(scalar equivalent: 0.93 under the budget).  These kernels make the window
explicit with one VMEM halo ring per vector column.

Buffer-count discipline (measured, CLAUDE.md #4): Pallas per-stream
pipeline overhead grows past ~9 buffers, so the k·bs² coefficient streams
travel as ONE stacked (R, n) array — rows (i, d, j) with each output row
i's group padded to a multiple of 8 so the per-i slices are sublane-group
aligned — and the shifted operands are gathered once per grid step into a
(G8, T) window matrix XW (row (d,j) = x_j[·+o_d]) so the whole contraction
is one elementwise product + sublane-sum per output row:

    y_i = Σ_sublanes ( C[i·G8:(i+1)·G8, :] ⊙ XW )

(reference: this replaces the hot loops of src/blas/matvecs.cpp block gemv
on banded storage; no counterpart exists in the reference — it is a
consequence of the TPU memory hierarchy.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import (
    _NBUF,
    _clampmap,
    _interpret,
    _ring_window,
    pad_vec,
    stencil_plan,
    unpad_vec,
)

__all__ = ["bdia_spmv_stencil_cols", "bdia_spmv_stencil",
           "stack_spmv_coeffs", "stack_factor_coeffs",
           "bdia_factor_u0_sweep_stencil", "bstencil_gate"]


def _g8(x: int) -> int:
    return -(-x // 8) * 8


def bstencil_gate(offsets, nb: int, bs: int, itemsize: int = 4):
    """Production gating: real TPU + eligible tile plan + the bs-column
    shifted window past the fusion-locality budget.  The block threshold is
    HALF the scalar one: with bs interleaved shifted operands plus the
    k·bs² coefficient streams contending for the same on-chip window, the
    fused path already drops to 0.41 of stream at a 512 KB window (bs=4,
    g=128 measured) where the scalar kernel still ran at 0.93.

    The VMEM check sizes the *block* kernels' real footprint (the widest of
    the SpMV and factor coefficient slabs, double-buffered, plus rings and
    output slabs) against the raised per-kernel limit — the scalar plan's
    12 MB/k-stream model undercounts the slabs by ~bs² (ADVICE r4)."""
    if _interpret():
        return None
    H = max((abs(o) for o in offsets), default=0)
    if bs * 2 * H * itemsize <= 256 * 1024:
        return None
    plan = stencil_plan(tuple(offsets), nb, itemsize)  # shape/divisibility
    if plan is None:
        return None
    T, nt = plan
    k = len(offsets)
    kl = sum(1 for o in offsets if o < 0)
    b2 = bs * bs
    # widest slab: SpMV coefficients (bs·G8 rows) vs factor stack
    # (b2·(1+2·npairs) rows, npairs ≤ kl); + dinv ring + out slabs + window
    slab_rows = max(bs * _g8(k * bs), _g8(b2 * (1 + 2 * kl)))
    vmem = (2 * slab_rows + _NBUF * _g8(b2) + 2 * 2 * _g8(b2)
            + _g8(k * bs)) * T * itemsize
    if vmem > 80 * 1024 * 1024:     # kernels raise the limit to 100 MB
        return None
    return plan


def stack_spmv_coeffs(offsets, data, bs: int) -> jax.Array:
    """Stack the SoA component streams into the kernel's (bs·G8, nb) layout:
    row i·G8 + d·bs + j = data[d][i·bs+j]; rows [k·bs, G8) of each i-group
    are zero (they multiply whatever is in the padding rows of XW)."""
    k = len(offsets)
    G8 = _g8(k * bs)
    nb = data[0][0].shape[0]
    rows = []
    zero = jnp.zeros((nb,), data[0][0].dtype)
    for i in range(bs):
        for d in range(k):
            for j in range(bs):
                rows.append(data[d][i * bs + j])
        rows.extend([zero] * (G8 - k * bs))
    return jnp.stack(rows)


@functools.lru_cache(maxsize=64)
def _bspmv_call(offsets: tuple, bs: int, nb: int, T: int, dtype_name: str):
    k = len(offsets)
    G8 = _g8(k * bs)
    nt = nb // T
    dt = jnp.dtype(dtype_name)

    def kernel(*refs):
        C = refs[0]                       # (bs·G8, T) clamped block
        xps = refs[1:1 + bs]              # padded columns, HBM
        outs = refs[1 + bs:1 + 2 * bs]    # padded columns, block tt
        xbufs = refs[1 + 2 * bs:1 + 3 * bs]
        xw = refs[1 + 3 * bs]             # (G8, T) scratch window matrix
        sems = refs[2 + 3 * bs]

        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        wins = [_ring_window(xps[j], xbufs[j], sems.at[j], tt, ntp, T)
                for j in range(bs)]

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            # zero the padding rows' group once (garbage × 0 is NaN-unsafe)
            if G8 > k * bs:
                xw[G8 - 8:G8, :] = jnp.zeros((8, T), dt)
            for d in range(k):
                for j in range(bs):
                    xw[d * bs + j, :] = wins[j](offsets[d])
            w = xw[:, :]
            for i in range(bs):
                prod = C[i * G8:(i + 1) * G8, :] * w
                outs[i][:] = jnp.sum(prod, axis=0)

        @pl.when(jnp.logical_not(real))
        def _():
            for i in range(bs):
                outs[i][:] = jnp.zeros((T,), dt)

    cspec = pl.BlockSpec((bs * G8, T), lambda tt: (0, jnp.clip(tt - 1, 0,
                                                               nt - 1)),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((T,), lambda tt: (tt,), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=[cspec] + [any_spec] * bs,
        out_specs=[pspec] * bs,
        out_shape=[jax.ShapeDtypeStruct((nb + 2 * T,), dt)] * bs,
        scratch_shapes=[pltpu.VMEM((_NBUF * T,), dt) for _ in range(bs)]
        + [pltpu.VMEM((G8, T), dt),
           pltpu.SemaphoreType.DMA((bs, _NBUF))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def bdia_spmv_stencil_cols(offsets, Cstack: jax.Array, xps, T: int):
    """Padded-frame block-DIA SpMV on stacked coefficients.

    ``Cstack`` from :func:`stack_spmv_coeffs`; ``xps`` a tuple of bs padded
    (nb+2T,) column vectors; returns the tuple of bs padded output columns
    (pad tiles zero), so sweep chains pay zero repacking."""
    bs = len(xps)
    nb = xps[0].shape[0] - 2 * T
    call = _bspmv_call(tuple(offsets), bs, nb, T,
                       jnp.dtype(Cstack.dtype).name)
    return call(Cstack, *xps)


def bdia_spmv_stencil(A, x: jax.Array, plan) -> jax.Array:
    """(nb, bs) → (nb, bs) block-DIA SpMV through the stencil kernel (the
    unpadded convenience wrapper used by ops.bdia.bdia_spmv's gate)."""
    T, _ = plan
    bs = A.bs
    C = stack_spmv_coeffs(A.offsets, A.data, bs)
    xps = tuple(pad_vec(x[:, j], T) for j in range(bs))
    outs = bdia_spmv_stencil_cols(A.offsets, C, xps, T)
    return jnp.stack([unpad_vec(o, T) for o in outs], axis=1)


# ------------------------------------------------------------- factor -------

def _ring_window2d(xp_ref, xbuf, sems, tt, ntp, T):
    """2-D halo ring: same DMA protocol as ops.stencil._ring_window but over
    (R, T) slabs of an (R, n+2T) HBM array, slots on the LANE axis of an
    (R, 4T) scratch.  Returns ``wslice(row, o)`` for o ∈ [−T, 0] (the factor
    kernel's shifts are all lower offsets, so a left 2-slot window
    suffices); the 2-slot window is materialised at most once."""
    def dma(i):
        slot = pl.multiple_of((i % _NBUF) * T, T)
        return pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(i * T, T)], xbuf.at[:, pl.ds(slot, T)],
            sems.at[i % _NBUF])

    @pl.when(tt == 0)
    def _():
        dma(0).start()
        dma(1).start()
        dma(2).start()

    @pl.when((tt >= 1) & (tt + 2 <= ntp - 1))
    def _():
        dma(tt + 2).start()

    @pl.when(tt == 1)
    def _():
        dma(0).wait()
        dma(1).wait()
        dma(2).wait()

    @pl.when((tt >= 2) & (tt + 1 <= ntp - 1))
    def _():
        dma(tt + 1).wait()

    t = tt - 1

    def slot(i):
        return xbuf[:, pl.ds(pl.multiple_of((i % _NBUF) * T, T), T)]

    win = []

    def wslice(row, o):
        if o == 0:
            return slot(t + 1)[row, :]
        if o == -T:
            return slot(t)[row, :]
        if not win:
            win.append(jnp.concatenate([slot(t), slot(t + 1)], axis=1))
        return win[0][row, T + o:2 * T + o]

    return wslice


def stack_factor_coeffs(pairs_key, d0, base_t, ub_src, bs: int) -> jax.Array:
    """(bs²·(1+2·npair) rows, nb) coefficient stack for the factor kernel:
    base0 components (bs² rows), then per pair its lower base (bs²), then
    per pair its PRE-SHIFTED upper from ``ub_src`` (the initial iterate —
    pair-free uppers are fixed points, so the shift amortises over all
    sweeps)."""
    from ..sparse.dia import shift_read

    rows = list(base_t[d0])
    for (dl, _, _) in pairs_key:
        rows.extend(base_t[dl])
    for (_, du, o1) in pairs_key:
        rows.extend(shift_read(c, o1) for c in ub_src[du])
    zero = jnp.zeros_like(rows[0])
    rows.extend([zero] * (_g8(len(rows)) - len(rows)))
    return jnp.stack(rows)


@functools.lru_cache(maxsize=64)
def _bfactor_u0_call(pair_offs: tuple, bs: int, nb: int, T: int,
                     dtype_name: str):
    """One compressed block Chow–Patel sweep (u0-only state; see
    precond/bdia_ilu0.bdia_factor_sweeps_compressed for the math):

      U0'[i,j] = base0[i,j] − Σ_p Σ_l (Σ_k B_p[i,k]·Dinv[k,l][·+o_p])·U_p[l,j]

    with Dinv (the batched Gauss–Jordan inverse of the previous U0,
    computed in XLA between kernel calls) fetched once through a 2-D halo
    ring.  3 buffers total (coefficient stack, Dinv slab, output slab) —
    Pallas per-stream overhead makes a 112-buffer SoA kernel unusable
    (CLAUDE.md Pallas #4)."""
    npair = len(pair_offs)
    b2 = bs * bs
    B8 = _g8(b2)          # slab rows padded to the (8, 128) sublane tiling
    R = _g8(b2 * (1 + 2 * npair))
    nt = nb // T
    dt = jnp.dtype(dtype_name)

    def kernel(C, dinvp, out, xbuf, sems):
        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        ws = _ring_window2d(dinvp, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            base0 = [C[i, :] for i in range(b2)]
            acc = list(base0)
            for p, o in enumerate(pair_offs):
                B = [C[b2 + p * b2 + r, :] for r in range(b2)]
                U = [C[b2 * (1 + npair) + p * b2 + r, :] for r in range(b2)]
                D = [ws(r, o) for r in range(b2)]
                for i in range(bs):
                    tmp = []
                    for l in range(bs):
                        s = B[i * bs] * D[l]
                        for k in range(1, bs):
                            s = s + B[i * bs + k] * D[k * bs + l]
                        tmp.append(s)
                    for j in range(bs):
                        t_ = tmp[0] * U[j]
                        for l in range(1, bs):
                            t_ = t_ + tmp[l] * U[l * bs + j]
                        acc[i * bs + j] = acc[i * bs + j] - t_
            for r in range(b2):
                out[r, :] = acc[r]
            for r in range(b2, B8):
                out[r, :] = jnp.zeros((T,), dt)

        @pl.when(jnp.logical_not(real))
        def _():
            for r in range(B8):
                out[r, :] = jnp.zeros((T,), dt)

    cspec = pl.BlockSpec((R, T), lambda tt: (0, jnp.clip(tt - 1, 0, nt - 1)),
                         memory_space=pltpu.VMEM)
    pspec2 = pl.BlockSpec((B8, T), lambda tt: (0, tt),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=[cspec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pspec2,
        out_shape=jax.ShapeDtypeStruct((B8, nb + 2 * T), dt),
        scratch_shapes=[pltpu.VMEM((B8, _NBUF * T), dt),
                        pltpu.SemaphoreType.DMA((_NBUF,))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def bdia_factor_u0_sweep_stencil(pair_offs, Cstack, dinvp, bs: int, T: int):
    """One compressed sweep: (b2, nb+2T) padded Dinv slab in, padded U0'
    slab out."""
    nb = dinvp.shape[1] - 2 * T
    call = _bfactor_u0_call(tuple(pair_offs), bs, nb, T,
                            jnp.dtype(Cstack.dtype).name)
    return call(Cstack, dinvp)
