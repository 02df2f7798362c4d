"""Symmetric Gauss-Seidel preconditioner and GS relaxations, sweep-based.

Equivalents of ``AsyncSGS_SRPreconditioner`` / ``AsyncBlockSGS_SRPreconditioner``
(reference: src/solverops_sgs.cpp:17-203) and the Chazan–Miranker chaotic
relaxation (reference: src/relaxation_chaotic.cpp).

The preconditioner solves (D+L) D⁻¹ (D+U) z = r by ``napplysweeps`` Jacobi
sweeps on the forward system followed by ``napplysweeps`` on the backward
system — the synchronous re-expression of the reference's asynchronous loops
(solverops_sgs.cpp:62-82):

    forward:  y ← D⁻¹ (r − L y)
    backward: z ← y − D⁻¹ (U z)

The reference's *chaotic* relaxation updates rows in racing order reading
whatever neighbour values are present; the deterministic TPU analogue is a
Jacobi sweep (all neighbours read from the previous iterate).  The symmetric
GS relaxation gains its Gauss–Seidel character back through ``inner_sweeps``
sub-iterations of the forward/backward halves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ApplyInit
from ..ops.sweeps import (
    bgs_sweep,
    block_bgs_sweep,
    block_fgs_sweep,
    block_jacobi_sweep,
    block_lower_mv,
    block_upper_mv,
    fgs_sweep,
    invert_diag_blocks,
    jacobi_sweep,
    lower_mv,
    run_sweeps,
    upper_mv,
)
from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR
from .base import Preconditioner, PrecInfo
from .jacobi import _DiagStateMixin, relax_loop

__all__ = ["SGSPreconditioner", "BSGSPreconditioner",
           "ChaoticRelaxation", "BlockChaoticRelaxation"]


class _DiagState(NamedTuple):
    dinv: jax.Array


class SGSPreconditioner(_DiagStateMixin, Preconditioner):
    """Sweep-approximated symmetric Gauss-Seidel, scalar CSR
    (reference: solverops_sgs.cpp:118-203)."""

    def __init__(self, mat: PaddedCSR, napplysweeps: int = 1,
                 apply_init: ApplyInit = ApplyInit.ZERO, inner_sweeps: int = 2):
        super().__init__(mat)
        self.napplysweeps = napplysweeps
        self.apply_init = apply_init
        self.inner_sweeps = inner_sweeps

    def compute(self) -> PrecInfo:
        self.state = _DiagState(dinv=1.0 / self.mat.diag_vals)
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        A, dinv, ns = mat, state.dinv, self.napplysweeps
        y0 = jnp.zeros_like(r)
        y = run_sweeps(ns, lambda y: fgs_sweep(A, dinv, r, y), y0)
        # init of the backward solve (reference: solverops_sgs.cpp:162-169)
        z0 = y if self.apply_init == ApplyInit.JACOBI else jnp.zeros_like(r)
        return run_sweeps(ns, lambda z: bgs_sweep(A, dinv, y, z), z0)

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        """Symmetric GS relaxation: one step = forward sweep + backward sweep
        (reference: solverops_sgs.cpp:180-203).  The forward half solves
        (D+L)x' = b − U x and the backward half (D+U)x'' = b − L x', each by
        ``inner_sweeps`` Jacobi-on-triangular iterations — the synchronous
        stand-in for the reference's in-sweep value reuse, which preserves the
        SGS character that makes it beat plain Jacobi (reference test
        upper_bound_its, tests/CMakeLists.txt:365-372)."""
        A, dinv, m = self.mat, self.state.dinv, self.inner_sweeps

        def step(bb, xx):
            ux = upper_mv(A, A.vals_pad, xx)
            xf = xx
            for _ in range(m):
                xf = dinv * (bb - ux - lower_mv(A, A.vals_pad, xf))
            lx = lower_mv(A, A.vals_pad, xf)
            xb = xf
            for _ in range(m):
                xb = dinv * (bb - lx - upper_mv(A, A.vals_pad, xb))
            return xb

        return relax_loop(step, b, x, self.solveparams)


class BSGSPreconditioner(_DiagStateMixin, Preconditioner):
    """Block SGS (reference: solverops_sgs.cpp:17-116); diagonal blocks
    pre-inverted at compute, all block products batched onto the MXU."""

    def __init__(self, mat: PaddedBSR, napplysweeps: int = 1,
                 apply_init: ApplyInit = ApplyInit.ZERO, inner_sweeps: int = 2):
        super().__init__(mat)
        self.napplysweeps = napplysweeps
        self.apply_init = apply_init
        self.inner_sweeps = inner_sweeps

    def compute(self) -> PrecInfo:
        self.state = _DiagState(dinv=invert_diag_blocks(self.mat.diag_blocks))
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        A, dinv, ns = mat, state.dinv, self.napplysweeps
        y0 = jnp.zeros_like(r)
        y = run_sweeps(ns, lambda y: block_fgs_sweep(A, dinv, r, y), y0)
        z0 = y if self.apply_init == ApplyInit.JACOBI else jnp.zeros_like(r)
        return run_sweeps(ns, lambda z: block_bgs_sweep(A, dinv, y, z), z0)

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        A, dinv, m = self.mat, self.state.dinv, self.inner_sweeps

        def step(bb, xx):
            xf = xx
            for _ in range(m):
                xf = block_jacobi_sweep(A, dinv, bb, xf, xx)
            xb = xf
            for _ in range(m):
                xb = block_jacobi_sweep(A, dinv, bb, xf, xb)
            return xb

        return relax_loop(step, b, x, self.solveparams)


class ChaoticRelaxation(_DiagStateMixin, Preconditioner):
    """Chazan–Miranker chaotic (forward GS) relaxation, deterministic form
    (reference: src/relaxation_chaotic.cpp:32-70).  ``apply`` runs a fixed
    ``napplysweeps`` sweeps from zero; ``apply_relax`` runs ``maxits`` sweeps."""

    def __init__(self, mat: PaddedCSR, napplysweeps: int = 1):
        super().__init__(mat)
        self.napplysweeps = napplysweeps

    def compute(self) -> PrecInfo:
        self.state = _DiagState(dinv=1.0 / self.mat.diag_vals)
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        A, dinv = mat, state.dinv
        x0 = jnp.zeros_like(r)
        return run_sweeps(self.napplysweeps,
                          lambda x: jacobi_sweep(A, dinv, r, x), x0)

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        A, dinv = self.mat, self.state.dinv
        return relax_loop(lambda bb, xx: jacobi_sweep(A, dinv, bb, xx),
                          b, x, self.solveparams)


class BlockChaoticRelaxation(_DiagStateMixin, Preconditioner):
    """Block chaotic relaxation (reference: relaxation_chaotic.cpp block path)."""

    def __init__(self, mat: PaddedBSR, napplysweeps: int = 1):
        super().__init__(mat)
        self.napplysweeps = napplysweeps

    def compute(self) -> PrecInfo:
        self.state = _DiagState(dinv=invert_diag_blocks(self.mat.diag_blocks))
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        A, dinv = mat, state.dinv
        x0 = jnp.zeros_like(r)
        return run_sweeps(self.napplysweeps,
                          lambda x: block_jacobi_sweep(A, dinv, r, x), x0)

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        A, dinv = self.mat, self.state.dinv
        return relax_loop(lambda bb, xx: block_jacobi_sweep(A, dinv, bb, xx),
                          b, x, self.solveparams)
