"""Inner-Krylov preconditioning — the PCKSP leaf of the solver stack.

The reference's stack walker recurses into nested KSPs: under ``PCKSP`` the
"preconditioner" applied by the outer Krylov method is itself a bounded inner
Krylov solve, whose own leaf preconditioner is a BLASTed operator
(reference: setup_blasted_stack_ext PCKSP branch, blasted_petsc.cpp:631-637;
PCMG smoother recursion :610-630 has the same shape).  Here the whole stack
is in-framework, so the analogue is a :class:`Preconditioner` whose
``apply`` runs ``inner_iters`` iterations of an inner solver M z ≈ r.

Because z = M⁻¹r is then a *nonlinear* function of r (it varies with the
iterate), the outer method must be flexible — use :func:`gcr` (≈ FGMRES),
exactly why the reference carries GCR in its solver set
(tests/solvers.cpp:252-352).

The inner solve is jit-traceable: fixed iteration count (tol=0 disables the
early exit) so the outer ``lax.while_loop`` sees a static subgraph.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .base import Preconditioner

__all__ = ["InnerKrylovPreconditioner"]


class InnerKrylovPreconditioner(Preconditioner):
    """apply(r) = x after ``inner_iters`` steps of ``method`` on A x = r,
    preconditioned by ``leaf`` (a computed :class:`Preconditioner`)."""

    def __init__(self, amat: Callable, leaf: Preconditioner,
                 method: str = "richardson", inner_iters: int = 5):
        # no own matrix/state: this operator composes amat with the leaf
        self.mat = getattr(leaf, "mat", None)
        self.state = None
        self.amat = amat
        self.leaf = leaf
        self.method = method
        self.inner_iters = inner_iters

    @property
    def block_size(self) -> int:
        return 1  # operates on flat vectors via amat

    def compute(self):
        return self.leaf.compute()

    def apply(self, r: jax.Array) -> jax.Array:
        from ..solvers import bicgstab, cg, gcr, richardson

        solver = {"richardson": richardson, "bicgstab": bicgstab,
                  "cg": cg, "gcr": gcr}[self.method]
        x, _ = solver(self.amat, self.leaf.apply_flat, r, jnp.zeros_like(r),
                      tol=0.0, maxiter=self.inner_iters)
        return x

    def apply_flat(self, r: jax.Array) -> jax.Array:
        return self.apply(r)

    def apply_relax(self, b, x):
        raise NotImplementedError("inner-Krylov has no relaxation form "
                                  "(matches PCKSP)")
