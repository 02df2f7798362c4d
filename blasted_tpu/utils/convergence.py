"""Async-ILU convergence histories: fixed-point residual and factor errors.

Library form of the reference's convergence studies
(reference: tests/solverops/async_ilu_convergence.cpp:34-140 — max-norm L/U
errors and nonlinear remainder vs sweep count; plotted by
scripts/plotasyncconv.py:22-91).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ilu_convergence_history"]


def ilu_convergence_history(A, max_sweeps: int = 30, use_scaling: bool = False):
    """Returns dict with per-sweep arrays: ``remainder`` (nonlinear ILU
    residual ‖A − L·U‖ restricted to the pattern), ``l_error`` and
    ``u_error`` (max-norm distance to the exact ILU(0) factors)."""
    import jax.numpy as jnp

    from ..config import SEQUENTIAL
    from ..precond.ilu0 import ILU0Preconditioner

    P = A.pad() if hasattr(A, "pad") else A

    exact = ILU0Preconditioner(P, nbuildsweeps=SEQUENTIAL, napplysweeps=1,
                               use_scaling=use_scaling)
    exact.compute()
    ilu_exact = np.asarray(exact.state.ilu)

    p = ILU0Preconditioner(P, nbuildsweeps=1, napplysweeps=1,
                           use_scaling=use_scaling)
    p._ensure_symbolic()
    scale = None
    if use_scaling:
        scale = 1.0 / jnp.sqrt(p._vals[p.mat.diagind])
    base = p._scaled_vals(scale)
    sweep = p._factor_sweep_fn(base)
    sym = p.symbolic

    is_lower = np.asarray(sym.is_lower)
    ilu = p._fact_initial(base)

    rem, lerr, uerr = [], [], []
    for _ in range(max_sweeps + 1):
        d = np.asarray(ilu) - ilu_exact
        lerr.append(np.abs(np.where(is_lower, d, 0.0)).max())
        uerr.append(np.abs(np.where(~is_lower, d, 0.0)).max())
        rem.append(float(p._nonlinear_res(base, ilu)))
        ilu = sweep(ilu)

    return {"remainder": np.asarray(rem), "l_error": np.asarray(lerr),
            "u_error": np.asarray(uerr)}
