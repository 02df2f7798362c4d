"""Level-scheduled (exact) SGS preconditioner and CSC backward-GS.

Equivalents of ``Level_SGS`` / ``Level_BSGS``
(reference: src/solverops_levels_sgs.cpp, include/solverops_levels_sgs.hpp)
and ``CSC_BGS_Preconditioner`` (reference: src/solverops_sgs.cpp:205-273).

Level_SGS applies (D+L) D⁻¹ (D+U) z = r *exactly*: one wavefront-ordered
forward GS pass then one reverse-wavefront backward pass — the reference's
per-level barriered loops become masked whole-vector updates (levels computed
once at first compute, reference solverops_levels_sgs.cpp:45-48).

The reference's CSC-BGS parallelises backward GS column-wise with atomic
updates; its mathematics is plain backward GS  z ← D⁻¹(r − U z), which is how
the synchronous sweep form expresses it here (the CSC traversal was a
CPU-atomics trick, not a different operator).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sweeps import invert_diag_blocks, run_sweeps, upper_mv
from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR
from .base import Preconditioner, PrecInfo
from .levels import (
    compute_levels_lower,
    compute_levels_upper,
    exact_bgs,
    exact_block_bgs,
    exact_block_fgs,
    exact_fgs,
)

__all__ = ["LevelSGSPreconditioner", "BlockLevelSGSPreconditioner",
           "CSCBGSPreconditioner"]


class _LevelState(NamedTuple):
    dinv: jax.Array
    low_level: jax.Array
    up_level: jax.Array


def _build_levels(P):
    """Reconstruct flat colind and compute both wavefront orderings (host)."""
    from ..sparse.bdia import BlockDiaMatrix, block_pattern_csr
    from ..sparse.dia import DiaMatrix

    if isinstance(P, BlockDiaMatrix):
        rowptr, colind = block_pattern_csr(P)
    elif isinstance(P, DiaMatrix):
        sp = P.to_scipy()
        rowptr, colind = sp.indptr, sp.indices
    else:
        rowptr = np.asarray(P.rowptr)
        nnz = int(np.asarray(P.nnz_total))
        pos = np.asarray(P.pos)
        cols = np.asarray(P.colind)
        colind = np.zeros(nnz, dtype=np.int32)
        valid = pos < nnz
        colind[pos[valid]] = cols[valid]
    low = compute_levels_lower(rowptr, colind)
    up = compute_levels_upper(rowptr, colind)
    return jnp.asarray(low), int(low.max()) + 1, jnp.asarray(up), int(up.max()) + 1


class LevelSGSPreconditioner(Preconditioner):
    """Exact SGS via level scheduling, scalar
    (reference: solverops_levels_sgs.cpp Level_SGS)."""

    def __init__(self, mat: PaddedCSR):
        super().__init__(mat)
        self._levels = None

    def compute(self) -> PrecInfo:
        if self._levels is None:
            self._levels = _build_levels(self.mat)
        self.state = _LevelState(dinv=1.0 / self.mat.diag_vals,
                                 low_level=self._levels[0],
                                 up_level=self._levels[2])
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        _, nlow, _, nup = self._levels
        y = exact_fgs(mat, state.dinv, r, jnp.zeros_like(r),
                      state.low_level, nlow)
        return exact_bgs(mat, state.dinv, y, jnp.zeros_like(r),
                         state.up_level, nup)

    def patched_for_shards(self, precs):
        import copy
        q = copy.copy(self)
        q._levels = (self._levels[0],
                     max(p._levels[1] for p in precs),
                     self._levels[2],
                     max(p._levels[3] for p in precs))
        return q

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        """Exact symmetric GS relaxation: forward + backward exact sweeps per
        step — the oracle for the sweep-based SGS relaxation."""
        low, nlow, up, nup = self._levels
        dinv = self.state.dinv
        A = self.mat

        def step(_, xx):
            # forward: x_i = D⁻¹(b − L x_new − U x_old) in dependency order
            def fupd(y):
                gy = A.gather_x(y)
                lo = jnp.sum(jnp.where(A.lower_mask, A.vals_pad, 0.0) * gy, axis=1)
                gup = A.gather_x(xx)
                uo = jnp.sum(jnp.where(A.upper_mask, A.vals_pad, 0.0) * gup, axis=1)
                return dinv * (b - lo - uo)

            xf = jax.lax.fori_loop(
                0, nlow,
                lambda l, y: jnp.where(low == l, fupd(y), y), xx)

            def bupd(z):
                gz = A.gather_x(z)
                uo = jnp.sum(jnp.where(A.upper_mask, A.vals_pad, 0.0) * gz, axis=1)
                gl = A.gather_x(xf)
                lo = jnp.sum(jnp.where(A.lower_mask, A.vals_pad, 0.0) * gl, axis=1)
                return dinv * (b - lo - uo)

            xb = jax.lax.fori_loop(
                0, nup,
                lambda l, z: jnp.where(up == l, bupd(z), z), xf)
            return xb

        return jax.lax.fori_loop(0, self.solveparams.maxits, step, x)


class BlockLevelSGSPreconditioner(Preconditioner):
    """Exact block SGS via level scheduling
    (reference: solverops_levels_sgs.cpp Level_BSGS)."""

    def __init__(self, mat: PaddedBSR):
        super().__init__(mat)
        self._levels = None

    def compute(self) -> PrecInfo:
        if self._levels is None:
            self._levels = _build_levels(self.mat)
        self.state = _LevelState(dinv=invert_diag_blocks(self.mat.diag_blocks),
                                 low_level=self._levels[0],
                                 up_level=self._levels[2])
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        _, nlow, _, nup = self._levels
        y = exact_block_fgs(mat, state.dinv, r, jnp.zeros_like(r),
                            state.low_level, nlow)
        return exact_block_bgs(mat, state.dinv, y, jnp.zeros_like(r),
                               state.up_level, nup)

    def patched_for_shards(self, precs):
        import copy
        q = copy.copy(self)
        q._levels = (self._levels[0],
                     max(p._levels[1] for p in precs),
                     self._levels[2],
                     max(p._levels[3] for p in precs))
        return q

    def apply_relax(self, b, x):
        raise NotImplementedError


class CSCBGSPreconditioner(Preconditioner):
    """Backward Gauss-Seidel sweeps z ← D⁻¹(r − U z)
    (reference: CSC_BGS_Preconditioner, solverops_sgs.cpp:205-273 — flagged
    'inconsistent async' there; deterministic in the synchronous form)."""

    def __init__(self, mat: PaddedCSR, napplysweeps: int = 1):
        super().__init__(mat)
        self.napplysweeps = napplysweeps

    def compute(self) -> PrecInfo:
        self.state = _LevelState(dinv=1.0 / self.mat.diag_vals,
                                 low_level=jnp.zeros(0), up_level=jnp.zeros(0))
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        A, dinv = mat, state.dinv
        z0 = jnp.zeros_like(r)
        return run_sweeps(
            self.napplysweeps,
            lambda z: dinv * (r - upper_mv(A, A.vals_pad, z)), z0)

    def apply_relax(self, b, x):
        raise NotImplementedError("CSC_BGS relaxation not implemented "
                                  "(matches reference)")
