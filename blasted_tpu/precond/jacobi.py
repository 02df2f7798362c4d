"""(Block-)Jacobi preconditioner and relaxation.

Equivalent of ``JacobiSRPreconditioner`` / ``BJacobiSRPreconditioner``
(reference: src/solverops_jacobi.cpp, include/solverops_jacobi.hpp):
``compute`` inverts the (block) diagonal; ``apply`` is one D⁻¹r product;
``apply_relax`` runs damped-free Jacobi iterations with an optional
convergence check (reference: solverops_jacobi.cpp:174-220).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.blas1 import norm2
from ..ops.sweeps import (
    block_jacobi_sweep,
    invert_diag_blocks,
    jacobi_sweep,
)
from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR
from .base import Preconditioner, PrecInfo

__all__ = ["JacobiPreconditioner", "BJacobiPreconditioner",
           "relax_loop"]


class _DiagState(NamedTuple):
    dinv: jax.Array  # (n,) scalar or (nbrows, bs, bs) block inverse


def relax_loop(sweep_fn, b, x0, params):
    """Fixed-point relaxation driver with the reference's stopping logic
    (reference: solverops_jacobi.cpp:180-217): run ``maxits`` sweeps; if
    ``usetol``, stop early when the step-difference norm meets atol/rtol or
    exceeds dtol (divergence guard).  Implemented as ``lax.while_loop`` so the
    trip count stays data-dependent but bounded."""
    maxits = int(params.maxits)
    if not params.usetol:
        return jax.lax.fori_loop(0, maxits, lambda _, x: sweep_fn(b, x), x0)

    def cond(carry):
        step, x, refnorm, done = carry
        return (step < maxits) & jnp.logical_not(done)

    def body(carry):
        step, x, refnorm, _ = carry
        xn = sweep_fn(b, x)
        diff = norm2(xn - x)
        refnorm = jnp.where(step == 0, diff, refnorm)
        rel = diff / jnp.where(refnorm == 0, 1.0, refnorm)
        done = (diff < params.atol) | (rel < params.rtol) | (rel > params.dtol)
        return step + 1, xn, refnorm, done

    _, x, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, jnp.zeros((), x0.dtype), jnp.bool_(False)))
    return x


class _DiagStateMixin:
    """Single-trace distributed setup for operators whose state is the
    inverted (block) diagonal (jacobi/sgs/chaotic families)."""

    def shard_setup(self, local, nshards: int):
        return (), self

    def compute_state_with(self, mat, setup):
        if hasattr(mat, "diag_blocks"):   # block form (PaddedBSR / block-DIA)
            return _DiagState(dinv=invert_diag_blocks(mat.diag_blocks)), None
        return _DiagState(dinv=1.0 / mat.diag_vals), None


class JacobiPreconditioner(_DiagStateMixin, Preconditioner):
    """Scalar Jacobi (reference: solverops_jacobi.cpp:139-220)."""

    def __init__(self, mat: PaddedCSR):
        super().__init__(mat)

    def compute(self) -> PrecInfo:
        self.state = _DiagState(dinv=1.0 / self.mat.diag_vals)
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        return state.dinv * r

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        dinv = self.state.dinv
        return relax_loop(lambda bb, xx: jacobi_sweep(self.mat, dinv, bb, xx),
                          b, x, self.solveparams)


class BJacobiPreconditioner(_DiagStateMixin, Preconditioner):
    """Block Jacobi with batched diagonal-block inversion
    (reference: solverops_jacobi.cpp:30-121; Eigen .inverse() → batched
    jnp.linalg.inv on the MXU)."""

    def __init__(self, mat: PaddedBSR):
        super().__init__(mat)

    def compute(self) -> PrecInfo:
        self.state = _DiagState(dinv=invert_diag_blocks(self.mat.diag_blocks))
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        return jnp.einsum("rij,rj->ri", state.dinv, r,
                          preferred_element_type=r.dtype)

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        dinv = self.state.dinv
        return relax_loop(
            lambda bb, xx: block_jacobi_sweep(self.mat, dinv, bb, xx),
            b, x, self.solveparams)
