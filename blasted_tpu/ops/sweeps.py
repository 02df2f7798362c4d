"""Sweep kernels: the hot loops of every preconditioner.

TPU-native re-expression of the reference's per-row kernels
(reference: src/kernels/kernels_sgs.hpp:17-76, kernels_ilu_apply.hpp:15-94,
kernels_relaxation.hpp:17-54).

Design (SURVEY.md §2.5 P1): the reference races threads through rows with
``nowait`` so each row reads half-updated neighbours.  Here one *sweep* is a
synchronous, data-parallel update of all rows at once — sweep k reads sweep
k−1's values (Jacobi-on-triangular-systems, exactly the mathematics the
reference exposes through its bounded-sweep knobs).  Each sweep is one padded
gather + FMA + masked width-reduction; block variants batch ``bs×bs`` products
onto the MXU.  Multi-sweep drivers are ``lax.fori_loop`` with a static trip
count so XLA compiles a single fused loop body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR
from .spmv import block_matvec

__all__ = [
    "lower_mv", "upper_mv", "fgs_sweep", "bgs_sweep", "jacobi_sweep",
    "unit_lower_sweep", "upper_solve_sweep",
    "block_lower_mv", "block_upper_mv", "block_fgs_sweep", "block_bgs_sweep",
    "block_jacobi_sweep", "block_unit_lower_sweep", "block_upper_solve_sweep",
    "run_sweeps", "invert_diag_blocks",
]


# ---------------------------------------------------------------- scalar ----

def _masked(vals_pad: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.where(mask, vals_pad, jnp.zeros((), vals_pad.dtype))


def lower_mv(A, vals_pad: jax.Array, x: jax.Array) -> jax.Array:
    """(L x)_i over the strictly-lower entries of the given value layout.

    Dispatches on the storage format: padded CSR uses a masked gather;
    DIA uses shifted FMAs over the negative-offset diagonals (no gathers)."""
    from ..sparse.dia import DiaMatrix
    if isinstance(A, DiaMatrix):
        from .dia import dia_lower_mv
        return dia_lower_mv(A, vals_pad, x)
    xg = A.gather_x(x)
    return jnp.sum(_masked(vals_pad, A.lower_mask) * xg, axis=1)


def upper_mv(A, vals_pad: jax.Array, x: jax.Array) -> jax.Array:
    """(U x)_i over the strictly-upper entries (format-dispatched)."""
    from ..sparse.dia import DiaMatrix
    if isinstance(A, DiaMatrix):
        from .dia import dia_upper_mv
        return dia_upper_mv(A, vals_pad, x)
    xg = A.gather_x(x)
    return jnp.sum(_masked(vals_pad, A.upper_mask) * xg, axis=1)


def fgs_sweep(A: PaddedCSR, dinv: jax.Array, r: jax.Array, y: jax.Array) -> jax.Array:
    """Forward GS sweep: y ← D⁻¹ (r − L y)
    (reference: kernels_sgs.hpp scalar_fgs, :17-29)."""
    return dinv * (r - lower_mv(A, A.vals_pad, y))


def bgs_sweep(A: PaddedCSR, dinv: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Backward GS sweep: z ← y − D⁻¹ (U z)
    (reference: kernels_sgs.hpp scalar_bgs, :32-44 — solves D⁻¹(D+U) z = y)."""
    return y - dinv * upper_mv(A, A.vals_pad, z)


def jacobi_sweep(A: PaddedCSR, dinv: jax.Array, b: jax.Array,
                 xl: jax.Array, xu: jax.Array | None = None) -> jax.Array:
    """Relaxation sweep x ← D⁻¹ (b − L xl − U xu)
    (reference: kernels_relaxation.hpp scalar_relax, :40-54; separate lower/
    upper inputs enable Jacobi vs chaotic semantics via aliasing)."""
    if xu is None:
        xu = xl
    return dinv * (b - lower_mv(A, A.vals_pad, xl) - upper_mv(A, A.vals_pad, xu))


def unit_lower_sweep(A: PaddedCSR, ilu_pad: jax.Array,
                     z: jax.Array, y: jax.Array) -> jax.Array:
    """ILU forward sweep on L y = z with unit diagonal: y ← z − L y
    (reference: kernels_ilu_apply.hpp scalar_unit_lower_triangular, :15-27)."""
    return z - lower_mv(A, ilu_pad, y)


def upper_solve_sweep(A: PaddedCSR, ilu_pad: jax.Array, ilu_dinv: jax.Array,
                      y: jax.Array, z: jax.Array) -> jax.Array:
    """ILU backward sweep on U z = y: z ← u_ii⁻¹ (y − U z)
    (reference: kernels_ilu_apply.hpp scalar_upper_triangular, :30-42)."""
    return ilu_dinv * (y - upper_mv(A, ilu_pad, z))


# ----------------------------------------------------------------- block ----

def _bmasked(vals_pad: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.where(mask[:, :, None, None], vals_pad,
                     jnp.zeros((), vals_pad.dtype))


def block_lower_mv(A, vals_pad: jax.Array, x: jax.Array) -> jax.Array:
    """(L x) over strictly-lower blocks; x is (nbrows, bs).

    Format-dispatched: padded BSR (masked gather + batched matmul) or
    block-DIA (shifted batched matmuls, no gathers)."""
    from ..sparse.bdia import BlockDiaMatrix
    if isinstance(A, BlockDiaMatrix):
        from .bdia import bdia_lower_mv
        return bdia_lower_mv(A, vals_pad, x)
    xg = A.gather_x(x)
    return block_matvec(_bmasked(vals_pad, A.lower_mask), xg)


def block_upper_mv(A, vals_pad: jax.Array, x: jax.Array) -> jax.Array:
    from ..sparse.bdia import BlockDiaMatrix
    if isinstance(A, BlockDiaMatrix):
        from .bdia import bdia_upper_mv
        return bdia_upper_mv(A, vals_pad, x)
    xg = A.gather_x(x)
    return block_matvec(_bmasked(vals_pad, A.upper_mask), xg)


def _dmul(dblocks: jax.Array, seg: jax.Array) -> jax.Array:
    """Batched (n,bs,bs) @ (n,bs) — MXU."""
    return jnp.einsum("rij,rj->ri", dblocks, seg,
                      preferred_element_type=dblocks.dtype)


def block_fgs_sweep(A: PaddedBSR, dinv: jax.Array, r: jax.Array,
                    y: jax.Array) -> jax.Array:
    """y ← D⁻¹ (r − L y), block form (reference: kernels_sgs.hpp block_fgs, :47-59)."""
    return _dmul(dinv, r - block_lower_mv(A, A.vals_pad, y))


def block_bgs_sweep(A: PaddedBSR, dinv: jax.Array, y: jax.Array,
                    z: jax.Array) -> jax.Array:
    """z ← y − D⁻¹ (U z), block form (reference: kernels_sgs.hpp block_bgs, :62-76)."""
    return y - _dmul(dinv, block_upper_mv(A, A.vals_pad, z))


def block_jacobi_sweep(A: PaddedBSR, dinv: jax.Array, b: jax.Array,
                       xl: jax.Array, xu: jax.Array | None = None) -> jax.Array:
    """x ← D⁻¹ (b − L xl − U xu) (reference: kernels_relaxation.hpp
    block_relax_kernel, :17-37)."""
    if xu is None:
        xu = xl
    s = b - block_lower_mv(A, A.vals_pad, xl) - block_upper_mv(A, A.vals_pad, xu)
    return _dmul(dinv, s)


def block_unit_lower_sweep(A: PaddedBSR, ilu_pad: jax.Array,
                           z: jax.Array, y: jax.Array) -> jax.Array:
    """y ← z − L y (unit block diagonal)
    (reference: kernels_ilu_apply.hpp block_unit_lower_triangular, :54-67)."""
    return z - block_lower_mv(A, ilu_pad, y)


def block_upper_solve_sweep(A: PaddedBSR, ilu_pad: jax.Array, ilu_dinv: jax.Array,
                            y: jax.Array, z: jax.Array) -> jax.Array:
    """z ← U_ii⁻¹ (y − U z); diagonal blocks pre-inverted
    (reference: kernels_ilu_apply.hpp block_upper_triangular, :79-94, with the
    pre-inversion done after factorization, async_blockilu_factor.cpp:143-147)."""
    return _dmul(ilu_dinv, y - block_upper_mv(A, ilu_pad, z))


# --------------------------------------------------------------- drivers ----

def run_sweeps(nsweeps: int, sweep_fn, x0: jax.Array) -> jax.Array:
    """Run a fixed number of synchronous sweeps: x_{k+1} = sweep_fn(x_k).

    The analogue of the reference's ``omp parallel`` sweep loops
    (e.g. src/solverops_ilu0.cpp:99-141); static trip count → one compiled loop.
    """
    return jax.lax.fori_loop(0, nsweeps, lambda _, x: sweep_fn(x), x0)


def invert_diag_blocks(dblocks: jax.Array) -> jax.Array:
    """Batched inverse of (n, bs, bs) diagonal blocks
    (reference: Eigen .inverse() per block, solverops_jacobi.cpp:43-45).

    For small blocks (bs ≤ 8 — the reference's point-block sizes 3/4/5/7)
    this is an unrolled Gauss–Jordan elimination with partial pivoting,
    vectorised over the batch: every step is an elementwise/broadcast op over
    ``(n, bs, 2bs)``, so it runs at VPU stream speed with no gathers.
    ``jnp.linalg.inv`` lowers to a batched LU custom call that is orders of
    magnitude slower for tiny blocks on TPU; it remains the fallback for
    large blocks (dense coarse AMG levels etc.)."""
    bs = dblocks.shape[-1]
    if bs > 8:
        return jnp.linalg.inv(dblocks)
    return _gauss_jordan_inverse(dblocks)


def _gauss_jordan_inverse(a: jax.Array) -> jax.Array:
    """Unrolled batched Gauss–Jordan with partial pivoting on (n, bs, bs).

    Pivot row selection uses a one-hot mask instead of a gather; the
    row swap and elimination are `where`/broadcast arithmetic — TPU-native
    (the reference's Eigen fixed-size `.inverse()` is likewise unpivoted
    cofactors for bs ≤ 4 and PartialPivLU beyond; pivoting here covers both).
    """
    bs = a.shape[-1]
    dt = a.dtype
    n = a.shape[0]
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=dt), a.shape)
    M = jnp.concatenate([a, eye], axis=-1)              # (n, bs, 2bs)
    rows = jnp.arange(bs)

    for col in range(bs):
        # partial pivot: among rows >= col, the one maximising |M[:, r, col]|
        cand = jnp.where(rows[None, :] >= col,
                         jnp.abs(M[:, :, col]), jnp.full((), -1.0, dt))
        r = jnp.argmax(cand, axis=1)                    # (n,)
        sel = rows[None, :] == r[:, None]               # (n, bs) one-hot
        colhot = rows == col                            # (bs,)
        pivrow = jnp.sum(jnp.where(sel[:, :, None], M, 0), axis=1)  # (n, 2bs)
        currow = M[:, col, :]                           # (n, 2bs)
        # swap rows col <-> r (no-op when r == col)
        M = jnp.where(colhot[None, :, None], pivrow[:, None, :], M)
        M = jnp.where((sel & ~colhot[None, :])[:, :, None],
                      currow[:, None, :], M)
        # scale the pivot row, eliminate the column everywhere else
        piv = M[:, col, col]
        pn = M[:, col, :] / jnp.where(piv == 0, jnp.ones((), dt), piv)[:, None]
        fac = M[:, :, col]                              # (n, bs)
        M = jnp.where(colhot[None, :, None], pn[:, None, :],
                      M - fac[:, :, None] * pn[:, None, :])
    return M[:, :, bs:]
