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
travel as ONE stacked (~k·bs², n) array (rows (i, d, j), tail-padded to
the sublane multiple only) pipelined through BlockSpec, while the few
shifted operands (bs vector columns / bs² Dinv streams) use explicit
per-stream halo rings.  All per-tile compute is CHUNKED to 1024-lane
(one-vreg) slices and accumulated per output row in registers — full-T
vectors are 16 vregs each at T=16K and spill every intermediate
(CLAUDE.md Pallas #7-#9).

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
    _interpret,
    pad_vec,
    stencil_plan,
    unpad_vec,
)

__all__ = ["bdia_spmv_stencil_cols", "bdia_spmv_stencil",
           "stack_spmv_coeffs", "stack_factor_coeffs",
           "bdia_factor_u0_sweep_stencil", "bdia_factor_dinv_sweep_stencil",
           "gj_inverse_rows", "bstencil_gate"]


def _g8(x: int) -> int:
    return -(-x // 8) * 8


_SCH = 1024          # bspmv lane chunk: one (8, 128) f32 vreg
_FCH = 2048          # factor lane chunk: 2 vregs/value measured ~3% faster
#                      than 1 (591 -> 607 GB/s at bench size; 4096 equal,
#                      512 fails Mosaic sub-vreg shape constraints)


def bstencil_gate(offsets, nb: int, streams: int, itemsize: int = 4,
                  kind: str = "spmv"):
    """Production gating: real TPU + eligible tile plan + the shifted
    window of ``streams`` halo-ring operands (bs vector columns for the
    SpMV/sweep kernels, bs² inverse-diagonal streams for the factor) past
    the fusion-locality budget.  The block threshold is HALF the scalar
    one: with the interleaved shifted operands plus the k·bs² coefficient
    streams contending for the same on-chip window, the fused path already
    drops to 0.41 of stream at a 512 KB window (bs=4, g=128 measured)
    where the scalar kernel still ran at 0.93.

    The VMEM check sizes the requested *block* kernel's real footprint
    (coefficient slab double-buffered + halo rings + output slabs) against
    the raised 100 MB per-kernel limit — the scalar plan's 12 MB/k-stream
    model undercounts the slabs by ~bs² (ADVICE r4)."""
    if _interpret():
        return None
    H = max((abs(o) for o in offsets), default=0)
    if streams * 2 * H * itemsize <= 256 * 1024:
        return None
    plan = stencil_plan(tuple(offsets), nb, itemsize)  # shape/divisibility
    if plan is None:
        return None
    T, _ = plan
    k = len(offsets)
    kl = sum(1 for o in offsets if o < 0)
    if kind == "factor":
        # one (B8, NBUF·T) ring + double-buffered coefficient stack
        # (streams·(1+2·npairs) rows, npairs ≤ kl) + 2 double-buffered
        # output slabs (u0' and dinv')
        S8 = _g8(streams)
        rows = 2 * _g8(streams * (1 + 2 * kl)) + _NBUF * S8 + 4 * S8
    else:
        # streams rings + double-buffered (k·streams²) coefficient slab +
        # double-buffered outputs
        rows = (2 * _g8(k * streams * streams) + _NBUF * streams
                + 2 * streams)
    if rows * T * itemsize > 80 * 1024 * 1024:
        return None
    return plan


def stack_spmv_coeffs(offsets, data, bs: int) -> jax.Array:
    """Stack the SoA component streams into the kernel's (~k·bs², nb)
    layout: row i·(k·bs) + d·bs + j = data[d][i·bs+j], tail-padded to the
    sublane multiple only.  (The round-4 kernel's (bs·G8, nb) layout
    zero-padded every i-group to G8 = ceil8(k·bs) for its (G8, T) window
    reduction — 14%/12% pure padding traffic at bs=4/5 that the chunked
    kernel, which accumulates per row, does not need.)"""
    k = len(offsets)
    nb = data[0][0].shape[0]
    rows = []
    for i in range(bs):
        for d in range(k):
            for j in range(bs):
                rows.append(data[d][i * bs + j])
    zero = jnp.zeros((nb,), data[0][0].dtype)
    rows.extend([zero] * (_g8(k * bs * bs) - k * bs * bs))
    return jnp.stack(rows)


def _ring_dma(xp_ref, xbuf, sems, tt, ntp, T):
    """DMA protocol of the 1-D halo ring (the start/wait discipline of
    ops.stencil._ring_window, without the window reads)."""
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


def _ring_chunk_reader1d(xbuf, t, T, CH):
    """Chunked window reads over the 3-slot ring of a 1-D halo buffer.

    ``dread(o, c0)`` returns the (CH,) slice of ``x[·+o]`` for lanes
    [c0, c0+CH) of real tile ``t``, o ∈ [−T, T].  Same aligned-loads +
    lane-roll discipline required by Mosaic (it refuses
    unaligned ref slices); the scratch carries CH spare lanes."""
    def base(i):
        return pl.multiple_of((i % _NBUF) * T, T)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    roll = jnp.roll if _interpret() else pltpu.roll

    def rd(start):
        return xbuf[pl.ds(start, CH)]

    def dread(o, c0):
        q = T + c0 + o            # position in the 3-slot window [0, 3T)
        s, r = q // T, q % T
        if r + CH <= T:           # entirely inside slot t+s
            qa = (r // CH) * CH
            d = r - qa
            if d == 0:
                return rd(base(t + s) + qa)
            A = rd(base(t + s) + qa).reshape(1, CH)
            B = rd(base(t + s) + qa + CH).reshape(1, CH)
            comb = jnp.where(idx < d, B, A)
            return roll(comb, CH - d, axis=1).reshape(CH)
        d = T - r                 # straddle: d lanes from slot t+s
        left = rd(base(t + s) + (T - CH)).reshape(1, CH)
        right = rd(base(t + s + 1)).reshape(1, CH)
        comb = jnp.where(idx >= CH - d, left, right)
        return roll(comb, d, axis=1).reshape(CH)

    return dread


@functools.lru_cache(maxsize=64)
def _bspmv_call(offsets: tuple, bs: int, nb: int, T: int, dtype_name: str):
    """Block-DIA SpMV with per-column halo rings and REGISTER-CHUNKED
    compute: each (CH,) window chunk is read once and reused by the bs
    output rows directly from registers — no (G8, T) scratch window matrix
    (the round-4 kernel's per-row xw writes + full-T reduction spilled at
    T=16K lanes; chunking lifted block4_bspmv 0.79 → see bench)."""
    k = len(offsets)
    kb = k * bs
    RC = _g8(k * bs * bs)
    nt = nb // T
    dt = jnp.dtype(dtype_name)
    CH = min(_SCH, T)

    def kernel(*refs):
        C = refs[0]                       # (RC, T) clamped block
        xps = refs[1:1 + bs]              # padded columns, HBM
        outs = refs[1 + bs:1 + 2 * bs]    # padded columns, block tt
        xbufs = refs[1 + 2 * bs:1 + 3 * bs]
        sems = refs[1 + 3 * bs]

        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        for j in range(bs):
            _ring_dma(xps[j], xbufs[j], sems.at[j], tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            readers = [_ring_chunk_reader1d(xbufs[j], tt - 1, T, CH)
                       for j in range(bs)]
            for c0 in range(0, T, CH):
                sl = slice(c0, c0 + CH)
                w = [[readers[j](offsets[d], c0) for j in range(bs)]
                     for d in range(k)]
                for i in range(bs):
                    acc = None
                    for d in range(k):
                        for j in range(bs):
                            tm = C[i * kb + d * bs + j, sl] * w[d][j]
                            acc = tm if acc is None else acc + tm
                    outs[i][sl] = acc

        @pl.when(jnp.logical_not(real))
        def _():
            for i in range(bs):
                outs[i][:] = jnp.zeros((T,), dt)

    cspec = pl.BlockSpec((RC, T), lambda tt: (0, jnp.clip(tt - 1, 0,
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
        scratch_shapes=[pltpu.VMEM((_NBUF * T + CH,), dt) for _ in range(bs)]
        + [pltpu.SemaphoreType.DMA((bs, _NBUF))],
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
    unpadded convenience wrapper used by ops.bdia.bdia_spmv's gate).  The
    stacked coefficient layout is cached on the container for concrete
    values (BlockDiaMatrix.stacked_spmv_coeffs, ADVICE r4)."""
    T, _ = plan
    bs = A.bs
    C = A.stacked_spmv_coeffs()
    xps = tuple(pad_vec(x[:, j], T) for j in range(bs))
    outs = bdia_spmv_stencil_cols(A.offsets, C, xps, T)
    return jnp.stack([unpad_vec(o, T) for o in outs], axis=1)


# ------------------------------------------------------------- factor -------

def gj_inverse_rows(rows, bs: int):
    """Batched pivoted Gauss–Jordan inverse over bs² parallel component
    streams (``rows[i*bs+j]`` = stream of block entry (i, j); any vector
    shape).  Every step is an elementwise lane op, so the SAME code runs in
    XLA (``precond.bdia_ilu0._soa_gj_inverse`` delegates here) and inside
    the Pallas factor kernel on (T,) tiles — keeping the two paths
    numerically identical.  Pivot selection is a first-max where-chain
    (Mosaic-safe: no cross-sublane stack/argmax), which picks the same
    pivot as ``argmax`` for finite inputs.  Zero pivots are guarded to 1
    (masked/degenerate blocks invert to garbage the caller masks out)."""
    one = jnp.ones_like(rows[0])
    zero = jnp.zeros_like(rows[0])
    M = [[rows[i * bs + j] for j in range(bs)]
         + [one if i == j else zero for j in range(bs)]
         for i in range(bs)]
    for col in range(bs):
        cand = [jnp.abs(M[r][col]) for r in range(col, bs)]
        maxv = cand[0]
        for c in cand[1:]:
            maxv = jnp.maximum(maxv, c)
        w = []          # first-max one-hot over candidate rows
        found = None
        for c in cand:
            hit = (c == maxv) if found is None \
                else (c == maxv) & jnp.logical_not(found)
            w.append(hit)
            found = hit if found is None else found | hit
        pivrow = [sum(jnp.where(w[r - col], M[r][j], zero)
                      for r in range(col, bs)) for j in range(2 * bs)]
        currow = list(M[col])
        for r in range(col, bs):
            M[r] = [jnp.where(w[r - col], currow[j], M[r][j])
                    for j in range(2 * bs)]
        d = pivrow[col]
        dinv = 1.0 / jnp.where(d == 0, one, d)
        pn = [pivrow[j] * dinv for j in range(2 * bs)]
        for r in range(bs):
            if r == col:
                M[r] = pn
            else:
                f = M[r][col]
                M[r] = [M[r][j] - f * pn[j] for j in range(2 * bs)]
    return tuple(M[i][bs + j] for i in range(bs) for j in range(bs))




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


def _contract_u0_chunk(C, dread, pair_offs, bs: int, c0: int, CH: int):
    """The compressed-sweep contraction on one (CH,) lane chunk:

      U0'[i,j] = base0[i,j] − Σ_p Σ_l (Σ_k B_p[i,k]·Dinv[k,l][·+o_p])·U_p[l,j]

    with ``C`` the stacked coefficient block (base0 rows, then per pair its
    lower base B_p, then its pre-shifted upper U_p — stack_factor_coeffs)
    and ``dread(row, o, c0)`` the chunked Dinv halo-ring reader.  Chunking
    keeps the ~64-value live set of the contraction (and the Gauss–Jordan
    that follows it in the fused kernel) register-resident: at full tile
    width (T up to 16K lanes = 16 vregs per value) Mosaic spills every
    intermediate to VMEM — measured 0.27 of stream vs 0.79+ chunked."""
    npair = len(pair_offs)
    b2 = bs * bs
    sl = slice(c0, c0 + CH)
    acc = [C[i, sl] for i in range(b2)]
    for p, o in enumerate(pair_offs):
        B = [C[b2 + p * b2 + r, sl] for r in range(b2)]
        U = [C[b2 * (1 + npair) + p * b2 + r, sl] for r in range(b2)]
        D = [dread(r, o, c0) for r in range(b2)]
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
    return acc


@functools.lru_cache(maxsize=64)
def _bfactor_call(pair_offs: tuple, bs: int, nb: int, T: int,
                  dtype_name: str, out_dinv: bool):
    """One compressed block Chow–Patel sweep (u0-only evolving state; see
    precond/bdia_ilu0.bdia_factor_sweeps_compressed for the math), with
    the previous iterate's inverse diagonal Dinv carried as b2 padded 1-D
    streams, each fetched once through its own halo ring (the bspmv DMA
    shape — 2-D slab variants measured no better for bs=4 on chip and
    carry 28% ring/out padding waste at bs=5, B8=32 vs b2=25).

    ``out_dinv=True`` is the production per-sweep kernel: it maps
    Dinv_{k-1} → U0_k (in registers) → Dinv_k by running the batched
    pivoted Gauss–Jordan INSIDE the kernel (pure lane-elementwise math,
    ``gj_inverse_rows``), so a whole factorization does ZERO XLA work
    between sweeps — round 4 measured the per-sweep XLA GJ + slab glue at
    ~75% of the sweep wall-clock (VERDICT r4 #1).  ``out_dinv=False``
    emits U0_k instead (used once, for the final iterate)."""
    b2 = bs * bs
    R = _g8(b2 * (1 + 2 * len(pair_offs)))
    nt = nb // T
    dt = jnp.dtype(dtype_name)
    CH = min(_FCH, T)
    while T % CH:          # chunks must tile T exactly (T is a multiple
        CH //= 2           # of 1024, not necessarily of _FCH)

    def kernel(*refs):
        C = refs[0]
        dins = refs[1:1 + b2]
        outs = refs[1 + b2:1 + 2 * b2]
        xbufs = refs[1 + 2 * b2:1 + 3 * b2]
        sems = refs[1 + 3 * b2]
        tt = pl.program_id(0)
        ntp = pl.num_programs(0)
        for r in range(b2):
            _ring_dma(dins[r], xbufs[r], sems.at[r], tt, ntp, T)

        real = (tt >= 1) & (tt <= ntp - 2)

        @pl.when(real)
        def _():
            readers = [_ring_chunk_reader1d(xbufs[r], tt - 1, T, CH)
                       for r in range(b2)]

            def dread(r, o, c0):
                return readers[r](o, c0)

            for c0 in range(0, T, CH):
                acc = _contract_u0_chunk(C, dread, pair_offs, bs, c0, CH)
                if out_dinv:
                    # the gate requires an all-True diagonal mask, so the
                    # new U0 blocks invert unmasked; pad-tile lanes never
                    # reach a real tile's window (outputs zeroed below)
                    acc = list(gj_inverse_rows(acc, bs))
                for r in range(b2):
                    outs[r][c0:c0 + CH] = acc[r]

        @pl.when(jnp.logical_not(real))
        def _():
            for r in range(b2):
                outs[r][:] = jnp.zeros((T,), dt)

    cspec = pl.BlockSpec((R, T), lambda tt: (0, jnp.clip(tt - 1, 0, nt - 1)),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((T,), lambda tt: (tt,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nt + 2,),
        in_specs=[cspec] + [pl.BlockSpec(memory_space=pl.ANY)] * b2,
        out_specs=[pspec] * b2,
        out_shape=[jax.ShapeDtypeStruct((nb + 2 * T,), dt)] * b2,
        # + CH spare lanes: the high covering load of an unaligned read in
        # the LAST chunk of a slot may extend past the slot end
        scratch_shapes=[pltpu.VMEM((_NBUF * T + CH,), dt)
                        for _ in range(b2)]
        + [pltpu.SemaphoreType.DMA((b2, _NBUF))],
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def bdia_factor_u0_sweep_stencil(pair_offs, Cstack, dinv_streams, bs: int,
                                 T: int):
    """One compressed sweep: tuple of b2 padded (nb+2T,) Dinv streams in,
    tuple of b2 padded U0' streams out."""
    nb = dinv_streams[0].shape[0] - 2 * T
    call = _bfactor_call(tuple(pair_offs), bs, nb, T,
                         jnp.dtype(Cstack.dtype).name, False)
    return tuple(call(Cstack, *dinv_streams))


def bdia_factor_dinv_sweep_stencil(pair_offs, Cstack, dinv_streams, bs: int,
                                   T: int):
    """One fused compressed sweep: Dinv_{k-1} streams in, Dinv_k =
    GJ(U0_k) streams out — the per-sweep production kernel (the evolving
    state is the INVERSE diagonal; u0 never round-trips HBM)."""
    nb = dinv_streams[0].shape[0] - 2 * T
    call = _bfactor_call(tuple(pair_offs), bs, nb, T,
                         jnp.dtype(Cstack.dtype).name, True)
    return tuple(call(Cstack, *dinv_streams))
