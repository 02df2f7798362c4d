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
    on sublane tiling, which Mosaic refuses to slice); returns the (3T,)
    window for real tile t = tt−1.

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

    return jnp.concatenate([slot(t), slot(t + 1), slot(t + 2)])


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
        xw = _ring_window(xp, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            acc = dd[0][:] * xw[T + offsets[0]:2 * T + offsets[0]]
            for d in range(1, k):
                o = offsets[d]
                acc = acc + dd[d][:] * xw[T + o:2 * T + o]
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
        yw = _ring_window(yp, xbuf, sems, tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            acc = rhs[:]
            for j, o in enumerate(offs_sel):
                acc = acc - cc[j][:] * yw[T + o:2 * T + o]
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
def _factor_call(offsets: tuple, pairs_key: tuple, n: int, T: int,
                 dtype_name: str):
    """Fused Chow–Patel sweep for bands whose only pair-carrying diagonal is
    the main one (tensor-stencil family): one kernel updates the main
    diagonal and every lower diagonal; pair-free upper diagonals pass
    through outside.

      u0'[i]   = base0[i] − Σ_pairs ilu_l(o1)[i] · base_u(o−o1)[i+o1]
      l_o'[i]  = base_l(o)[i] / guard(u0[i+o])

    Evolving state travels in the PADDED frame (u0 and the lowers), so a
    sweep loop chains with zero repacking.  Reads per sweep: base0(1) +
    base_l(kl) + ilu_l(kl) + one fetch of each pair-upper + one fetch of u0
    (halo rings); writes 1 + kl."""
    lowers = tuple(d for d, o in enumerate(offsets) if o < 0)
    kl = len(lowers)
    npair = len(pairs_key)
    nt = n // T
    dt = jnp.dtype(dtype_name)
    pairs0 = list(pairs_key)   # [(d_lower, d_upper, o1)] for the d0 update

    def kernel(*refs):
        base0 = refs[0]                       # (T,) blocks, clamped map
        base_l = refs[1:1 + kl]               # (T,) blocks, clamped map
        ilu_lp = refs[1 + kl:1 + 2 * kl]      # padded frame, block tt
        u0p = refs[1 + 2 * kl]                # padded, HBM, halo ring
        ubp = refs[2 + 2 * kl:2 + 2 * kl + npair]   # padded, HBM, rings
        out0 = refs[2 + 2 * kl + npair]
        out_l = refs[3 + 2 * kl + npair:3 + 3 * kl + npair]
        scr = refs[3 + 3 * kl + npair:]
        xbufs = scr[:npair + 1]
        sems = scr[npair + 1]

        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        wins = [_ring_window(ref, buf, sems.at[a], tt, ntp, T)
                for a, (ref, buf) in enumerate(zip((u0p,) + tuple(ubp),
                                                   xbufs))]
        u0w = wins[0]

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            s = base0[:]
            for j, (dl, du, o1) in enumerate(pairs0):
                li = lowers.index(dl)
                s = s - ilu_lp[li][:] * wins[1 + j][T + o1:2 * T + o1]
            out0[:] = s
            for li, d in enumerate(lowers):
                o = offsets[d]
                den = u0w[T + o:2 * T + o]
                den = jnp.where(den == 0, jnp.ones((), dt), den)
                out_l[li][:] = base_l[li][:] / den

        @pl.when(jnp.logical_not(real))
        def _():
            out0[:] = jnp.zeros((T,), dt)
            for li in range(kl):
                out_l[li][:] = jnp.zeros((T,), dt)

    cm = _clampmap(nt)
    vspec = pl.BlockSpec((T,), cm, memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((T,), lambda tt: (tt,), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([vspec] * (1 + kl) + [pspec] * kl
                + [any_spec] * (1 + npair))
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=in_specs,
        out_specs=[pspec] * (1 + kl),
        out_shape=[jax.ShapeDtypeStruct((n + 2 * T,), dt)] * (1 + kl),
        scratch_shapes=[pltpu.VMEM((_NBUF * T,), dt)
                        for _ in range(npair + 1)]
        + [pltpu.SemaphoreType.DMA((npair + 1, _NBUF))],
        interpret=_interpret(),
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
    """Run ``nsweeps`` fused Chow–Patel sweeps with padded-frame chaining.
    ``base``/``ilu0`` are unpadded (n,) stream tuples; returns the unpadded
    tuple (pair-free uppers pass through untouched)."""
    n = base[0].shape[0]
    lowers = [d for d, o in enumerate(offsets) if o < 0]
    dt = jnp.dtype(base[0].dtype).name
    pairs_key = tuple(tuple(p) for p in pairs[d0])
    call = _factor_call(tuple(offsets), pairs_key, n, T, dt)

    base0 = base[d0]
    base_ls = [base[d] for d in lowers]
    ubp = [pad_vec(ilu0[du], T) for (_, du, _) in pairs_key]

    def sweep(carry):
        u0p, lps = carry
        outs = call(base0, *base_ls, *lps, u0p, *ubp)
        return outs[0], list(outs[1:])

    carry = (pad_vec(ilu0[d0], T), [pad_vec(ilu0[d], T) for d in lowers])
    u0p, lps = jax.lax.fori_loop(0, nsweeps, lambda i, c: sweep(c), carry)
    res = list(ilu0)
    res[d0] = unpad_vec(u0p, T)
    for li, d in enumerate(lowers):
        res[d] = unpad_vec(lps[li], T)
    return tuple(res)
