"""Pallas DIA-stencil kernels: explicit VMEM halo windows for large bands.

Why this exists (measured on the real v5e, round 4): the XLA-fused shifted-
FMA DIA kernels (ops/dia.py) rely on the compiler keeping the ±H-shifted
reads of the vector operand in a shared on-chip window.  That works up to a
window of ~0.5 MB (g=256: SpMV at 0.93 of spec HBM) and silently falls off a
cliff beyond it (g=320/384, window 0.8–1.2 MB: 0.53 of the measured stream —
the vector is re-fetched from HBM once per diagonal).  These kernels make
the window explicit: the vector lives in HBM, a 4-slot VMEM ring holds the
3-block halo window, one new block is DMA'd per grid step with a one-tile
lookahead (double buffering), and every coefficient stream is auto-pipelined
by Pallas block specs.  HBM traffic is exactly the byte model:
k·n (streams) + n (vector) + n (output).

Padded-frame convention: vectors are carried PADDED by one tile on each
side (``pad_vec``/``unpad_vec``); the kernels map padded→padded (the pad
tiles are written with zeros), so chained sweeps (Krylov/e2e solves, the
bench chains) pay zero repacking between applications.

(reference: this replaces the hot loops of src/blas/matvecs.cpp:24-75 and
kernels_sgs/ilu_apply on banded storage; no counterpart exists in the
reference — it is a consequence of the TPU memory hierarchy, SURVEY.md §7.)

Lessons from the superseded round-1 experiment (ops/pallas/dia_kernels.py,
retired in round 5): (a) Mosaic cannot slice a stacked scratch buffer on the
slot (sublane) axis — ring slots must live on the flat/lane axis (see
``_ring_window``/``_ring_window2d``); (b) an even/odd two-buffer window with
one DMA per grid step loses to the 4-slot ring + 1-tile lookahead because
the tail tile's wait has nothing in flight; (c) a (k, n) stacked coefficient
array forces sublane-strided per-diagonal reads — coefficients stream either
as separate (n,) operands (scalar) or as one sublane-aligned row-stacked
slab (block kernels, ops/bstencil.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_plan", "stencil_gate", "pad_vec", "unpad_vec",
           "dia_spmv_stencil", "dia_factor_sweeps_stencil",
           "factor_stencil_eligible", "unit_lower_sweep_stencil",
           "upper_solve_sweep_stencil"]

_NBUF = 4
_LANE = 1024            # block sizes are multiples of the (8, 128) f32 tile
_VMEM_BUDGET = 12 * 1024 * 1024


@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (CPU tests exercise the same kernels
    bit-for-bit through the interpreter).  The tunnelled TPU backend
    registers as "axon", not "tpu"."""
    return jax.default_backend() not in ("tpu", "axon")


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=64)
def stencil_plan(offsets: tuple, n: int, itemsize: int = 4,
                 extra_streams: int = 0):
    """Tile plan for a banded stencil: returns ``(T, nt)`` — tile size and
    real-tile count — or ``None`` when the band is not eligible (tile would
    not fit the VMEM budget, or the problem is too small to matter).

    ``extra_streams`` accounts for additional auto-pipelined operands of the
    caller's kernel beyond the ``len(offsets)`` coefficient streams."""
    H = max((abs(o) for o in offsets), default=0)
    if H == 0 or n < 4 * _LANE:
        return None
    T = _ceil_to(H, _LANE)
    if n % T or n // T < 2:
        # tiles must cover n exactly (containers pad to lane multiples on
        # the fast path; odd sizes fall back to the XLA kernels)
        return None
    k = len(offsets) + extra_streams
    # double-buffered streams + 4-slot ring + double-buffered output + window
    vmem = (2 * k + _NBUF + 2 + 3) * T * itemsize
    if vmem > _VMEM_BUDGET:
        return None
    return T, n // T


def stencil_gate(offsets: tuple, n: int, itemsize: int = 4,
                 extra_streams: int = 0):
    """Production gating for the stencil kernels: a real TPU backend, an
    eligible tile plan, AND a halo window past the ~0.5 MB XLA
    fusion-locality budget (below it the fused XLA path already runs at
    stream speed — measured g=256 SpMV at 0.93 of spec; above it the fused
    path drops to ~0.53, round-4 RESULTS)."""
    if _interpret():
        return None
    H = max((abs(o) for o in offsets), default=0)
    if 2 * H * itemsize <= 512 * 1024:
        return None
    return stencil_plan(tuple(offsets), n, itemsize, extra_streams)


def pad_vec(x: jax.Array, T: int) -> jax.Array:
    """[0_T ; x ; 0_T] — the padded vector frame."""
    z = jnp.zeros((T,), x.dtype)
    return jnp.concatenate([z, x, z])


def unpad_vec(xp: jax.Array, T: int) -> jax.Array:
    return xp[T:-T]


def _ring_window(xp_ref, xbuf, sems, tt, ntp, T):
    """Maintain the 3-block halo window of ``xp_ref`` (HBM) in the VMEM ring
    ``xbuf`` (a flat (4·T,) scratch — a (4, T) shape would put the slot axis
    on sublane tiling, which Mosaic refuses to slice); returns ``wslice``,
    mapping a shift o ∈ [−T, T] to the (T,) window slice of real tile
    t = tt−1.

    Protocol (each DMA started and waited exactly once, 1-tile lookahead):
      tt == 0 (pad tile): start blocks 0, 1, 2
      tt >= 1:            start block tt+2 (used at tile tt+1), while in range
      tt == 1:            wait 0, 1, 2
      tt >= 2:            wait block tt+1, while in range — the last grid
                          step is a pad tile whose window is unused; waiting
                          an unstarted block there deadlocks the DMA
                          semaphore and kills the worker (observed on chip)
    """
    def dma(i):
        slot = pl.multiple_of((i % _NBUF) * T, T)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(i * T, T)], xbuf.at[pl.ds(slot, T)],
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
        return xbuf[pl.ds(pl.multiple_of((i % _NBUF) * T, T), T)]

    win = []          # lazily materialised (3T,) window, built at most once

    def wslice(o):
        """The (T,) window slice at shift ``o`` ∈ [−T, T] of real tile t.
        Whole-slot shifts (o ∈ {0, ±T}) read their slot directly; interior
        shifts slice one shared materialised 3T window (Mosaic cannot
        concatenate offset slices directly)."""
        if o == 0:
            return slot(t + 1)
        if o == -T:
            return slot(t)
        if o == T:
            return slot(t + 2)
        if not win:
            win.append(jnp.concatenate([slot(t), slot(t + 1), slot(t + 2)]))
        return win[0][T + o:2 * T + o]

    return wslice


def _clampmap(nt):
    # coefficient blocks for grid index tt cover real tile t = tt−1,
    # clamped into range for the two pad tiles (their output is zeros)
    return lambda tt: (jnp.clip(tt - 1, 0, nt - 1),)


@functools.lru_cache(maxsize=64)
def _spmv_call(offsets: tuple, n: int, T: int, dtype_name: str):
    k = len(offsets)
    nt = n // T
    dt = jnp.dtype(dtype_name)

    def kernel(*refs):
        dd = refs[:k]
        xp = refs[k]
        out = refs[k + 1]
        xbuf, sems = refs[k + 2], refs[k + 3]
        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        xs = _ring_window(xp, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            acc = dd[0][:] * xs(offsets[0])
            for d in range(1, k):
                acc = acc + dd[d][:] * xs(offsets[d])
            out[:] = acc

        @pl.when(jnp.logical_not(real))
        def _():
            out[:] = jnp.zeros((T,), dt)

    in_specs = ([pl.BlockSpec((T,), _clampmap(nt),
                              memory_space=pltpu.VMEM)] * k
                + [pl.BlockSpec(memory_space=pl.ANY)])
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T,), lambda tt: (tt,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + 2 * T,), dt),
        scratch_shapes=[pltpu.VMEM((_NBUF * T,), dt),
                        pltpu.SemaphoreType.DMA((_NBUF,))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def dia_spmv_stencil(offsets: tuple, data: tuple, xp: jax.Array,
                     T: int) -> jax.Array:
    """Padded-frame DIA SpMV: yp[T+i] = Σ_d data[d][i]·xp[T+i+o_d]."""
    return _spmv_call(tuple(offsets), data[0].shape[0], T,
                      jnp.dtype(data[0].dtype).name)(*data, xp)


# ------------------------------------------------------- triangular sweeps --

@functools.lru_cache(maxsize=64)
def _tri_sweep_call(offs_sel: tuple, n: int, T: int, dtype_name: str,
                    with_dinv: bool, rhs_padded: bool = False):
    """One Jacobi-on-triangular sweep as a halo-ring stencil:
    out = (rhs − Σ_j coeff_j · evolving[i + o_j]) · (dinv | 1)
    — the ILU apply / SGS sweep shape (kernels_ilu_apply.hpp:15-94) with the
    evolving iterate fetched once through the VMEM ring."""
    m = len(offs_sel)
    nt = n // T
    dt = jnp.dtype(dtype_name)

    def kernel(*refs):
        cc = refs[:m]
        rhs = refs[m]
        i = m + 1
        dinv = None
        if with_dinv:
            dinv = refs[i]
            i += 1
        yp = refs[i]
        out = refs[i + 1]
        xbuf, sems = refs[i + 2], refs[i + 3]
        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        ys = _ring_window(yp, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            acc = rhs[:]
            for j, o in enumerate(offs_sel):
                acc = acc - cc[j][:] * ys(o)
            if with_dinv:
                acc = acc * dinv[:]
            out[:] = acc

        @pl.when(jnp.logical_not(real))
        def _():
            out[:] = jnp.zeros((T,), dt)

    cm = _clampmap(nt)
    vspec = pl.BlockSpec((T,), cm, memory_space=pltpu.VMEM)
    # padded-frame rhs (e.g. the lower-solve result feeding the upper
    # chain) reads block tt of the padded array directly — no repacking
    rhs_spec = (pl.BlockSpec((T,), lambda tt: (tt,),
                             memory_space=pltpu.VMEM)
                if rhs_padded else vspec)
    in_specs = ([vspec] * m + [rhs_spec] + [vspec] * int(with_dinv)
                + [pl.BlockSpec(memory_space=pl.ANY)])
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T,), lambda tt: (tt,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + 2 * T,), dt),
        scratch_shapes=[pltpu.VMEM((_NBUF * T,), dt),
                        pltpu.SemaphoreType.DMA((_NBUF,))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def unit_lower_sweep_stencil(offsets, ilu, z, yp, T: int,
                             rhs_padded: bool = False):
    """y ← z − L y on the padded frame (unit diagonal; cf.
    ops.sweeps.unit_lower_sweep).  ``z`` unpadded (n,) unless
    ``rhs_padded``; ``yp`` padded."""
    n = yp.shape[0] - 2 * T
    sel = tuple(o for o in offsets if o < 0)
    cc = [ilu[d] for d, o in enumerate(offsets) if o < 0]
    call = _tri_sweep_call(sel, n, T, jnp.dtype(yp.dtype).name, False,
                           rhs_padded)
    return call(*cc, z, yp)


def upper_solve_sweep_stencil(offsets, ilu, dinv, y, zp, T: int,
                              rhs_padded: bool = False):
    """z ← u_ii⁻¹ (y − U z) on the padded frame (cf.
    ops.sweeps.upper_solve_sweep).  ``dinv`` unpadded; ``y`` unpadded
    unless ``rhs_padded``; ``zp`` padded."""
    n = zp.shape[0] - 2 * T
    sel = tuple(o for o in offsets if o > 0)
    cc = [ilu[d] for d, o in enumerate(offsets) if o > 0]
    call = _tri_sweep_call(sel, n, T, jnp.dtype(zp.dtype).name, True,
                           rhs_padded)
    return call(*cc, y, dinv, zp)


# ------------------------------------------------------------- factor -------

@functools.lru_cache(maxsize=64)
def _factor_u0_call(lower_offs: tuple, n: int, T: int, dtype_name: str):
    """One compressed Chow–Patel sweep: with the lower diagonals substituted
    into the main-diagonal update, u0 is the ONLY evolving state,

      u0'[i] = base0[i] − Σ_j (base_l_j[i] / guard(u0[i+o_j])) · ubs_j[i]

    over the fill PAIRS j (o_j = the pair's lower offset, base_l_j = that
    lower's base stream, ubs_j = the pair-upper pre-shifted by o_j).
    3 + 2·npair streams per sweep — the memory-optimal sweep for this band
    family: 15n → 9n bytes (7-point) vs materialising the lowers each
    sweep, with bitwise-identical u0 iterates."""
    kl = len(lower_offs)
    nt = n // T
    dt = jnp.dtype(dtype_name)

    def kernel(*refs):
        base0 = refs[0]                       # padded frame, block tt
        base_l = refs[1:1 + kl]               # padded frame, block tt
        ubs = refs[1 + kl:1 + 2 * kl]         # pre-shifted, padded, block tt
        u0p = refs[1 + 2 * kl]                # padded, HBM, halo ring
        out0 = refs[2 + 2 * kl]
        xbuf, sems = refs[3 + 2 * kl], refs[4 + 2 * kl]

        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        u0s = _ring_window(u0p, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            s = base0[:]
            for j, o in enumerate(lower_offs):
                den = u0s(o)
                den = jnp.where(den == 0, jnp.ones((), dt), den)
                s = s - (base_l[j][:] / den) * ubs[j][:]
            out0[:] = s

        @pl.when(jnp.logical_not(real))
        def _():
            out0[:] = jnp.zeros((T,), dt)

    pspec = pl.BlockSpec((T,), lambda tt: (tt,), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=[pspec] * (1 + 2 * kl) + [any_spec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct((n + 2 * T,), dt),
        scratch_shapes=[pltpu.VMEM((_NBUF * T,), dt),
                        pltpu.SemaphoreType.DMA((_NBUF,))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@functools.lru_cache(maxsize=64)
def _factor_lower_call(lower_offs: tuple, n: int, T: int, dtype_name: str):
    """The halo part of the split Chow–Patel sweep: per lower diagonal,

      l_o'[i] = base_l(o)[i] / guard(u0[i+o])

    — the ONLY shifted reads of the sweep (all of the evolving u0, at the
    negative lower offsets), fetched once through a single VMEM halo ring.
    Inputs/outputs travel in the padded frame for zero-repack chaining."""
    kl = len(lower_offs)
    nt = n // T
    dt = jnp.dtype(dtype_name)

    def kernel(*refs):
        base_l = refs[:kl]                    # padded frame, block tt
        u0p = refs[kl]                        # padded, HBM, halo ring
        out_l = refs[kl + 1:kl + 1 + kl]
        xbuf, sems = refs[kl + 1 + kl], refs[kl + 2 + kl]

        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        u0s = _ring_window(u0p, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            for li, o in enumerate(lower_offs):
                den = u0s(o)
                den = jnp.where(den == 0, jnp.ones((), dt), den)
                out_l[li][:] = base_l[li][:] / den

        @pl.when(jnp.logical_not(real))
        def _():
            for li in range(kl):
                out_l[li][:] = jnp.zeros((T,), dt)

    pspec = pl.BlockSpec((T,), lambda tt: (tt,), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=[pspec] * kl + [any_spec],
        out_specs=[pspec] * kl,
        out_shape=[jax.ShapeDtypeStruct((n + 2 * T,), dt)] * kl,
        scratch_shapes=[pltpu.VMEM((_NBUF * T,), dt),
                        pltpu.SemaphoreType.DMA((_NBUF,))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def factor_stencil_eligible(offsets, pairs) -> bool:
    """The fused factor kernel covers bands where ONLY the main diagonal
    carries fill pairs (each pair = lower × upper) — true for every
    tensor-product stencil (7/9/27-point; offsets closed under o1+o2=0)."""
    d0 = offsets.index(0)
    for d, o in enumerate(offsets):
        if d != d0 and pairs[d]:
            return False
    return all(offsets[dl] < 0 and offsets[du] > 0
               for (dl, du, _) in pairs[d0])


def dia_factor_sweeps_stencil(offsets, pairs, d0, base, ilu0,
                              nsweeps: int, T: int):
    """Run ``nsweeps`` split Chow–Patel sweeps with padded-frame chaining.

    Substituting the lower update l_o = base_l/guard(u0[·+o]) into the
    main-diagonal update shows u0 is the ONLY evolving state:

      u0' = base0 − Σ_pairs (base_l(o1)/guard(u0[·+o1])) · ubs

    so each sweep is ONE 9-stream kernel (:func:`_factor_u0_call`) and the
    lower diagonals are materialised ONCE after the final sweep
    (:func:`_factor_lower_call`) from u0 of the second-to-last sweep —
    exactly the state the two-array Jacobi iteration would hold, so the
    result is bitwise identical to the uncompressed sweeps while moving
    9n instead of 15n bytes per sweep (7-point band).

    ``base``/``ilu0`` are unpadded (n,) stream tuples; returns the unpadded
    tuple (pair-free uppers pass through untouched)."""
    if nsweeps <= 0:
        return tuple(ilu0)
    lowers = [d for d, o in enumerate(offsets) if o < 0]
    lower_offs = tuple(offsets[d] for d in lowers)
    n = base[0].shape[0]
    dt = jnp.dtype(base[0].dtype).name
    pairs_key = tuple(tuple(p) for p in pairs[d0])
    pair_offs = tuple(o1 for (_, _, o1) in pairs_key)
    u0_call = _factor_u0_call(pair_offs, n, T, dt)
    low_call = _factor_lower_call(lower_offs, n, T, dt)

    # pair-uppers are fixed points — pre-shift once, amortised over sweeps;
    # everything travels in the padded frame (pad regions are zero and stay
    # zero: base pads are zero, 0/guard = 0 and 0·x = 0)
    from ..sparse.dia import shift_read
    base0p = pad_vec(base[d0], T)
    base_pair_lp = [pad_vec(base[dl], T) for (dl, _, _) in pairs_key]
    base_lp = [pad_vec(base[d], T) for d in lowers]
    ubs_p = [pad_vec(shift_read(ilu0[du], o1), T) for (_, du, o1) in pairs_key]

    def sweep(c):
        _, u0c = c
        return u0c, u0_call(base0p, *base_pair_lp, *ubs_p, u0c)

    u0c = pad_vec(ilu0[d0], T)
    u0_prev, u0_last = jax.lax.fori_loop(0, nsweeps,
                                         lambda i, c: sweep(c), (u0c, u0c))
    # lowers of the final state come from the PREVIOUS u0 iterate (the
    # two-array sweep updates l from the pre-sweep diagonal)
    lns = low_call(*base_lp, u0_prev)
    res = list(ilu0)
    res[d0] = unpad_vec(u0_last, T)
    for li, d in enumerate(lowers):
        res[d] = unpad_vec(lns[li], T)
    return tuple(res)
