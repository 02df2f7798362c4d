"""Level scheduling (wavefronts) — the exact sequential-equivalent paths.

Equivalent of the reference's ``computeLevels`` + level-scheduled solvers
(reference: src/levelschedule.cpp:11-75, src/solverops_levels_sgs.cpp,
src/solverops_levels_ilu0.cpp).  Where the reference runs one barriered
``omp parallel for`` per level, the TPU form runs one *masked whole-vector
update* per level inside a ``lax.fori_loop``: rows outside the active level
keep their values.  After the last level the result equals the sequential
(single-threaded) triangular solve / Gauss-Seidel sweep bit-for-bit in exact
arithmetic — this is the in-repo oracle replacing the reference's
``OMP_NUM_THREADS=1`` runs (SURVEY.md §4.2).

Level assignment is longest-path depth over the strictly-triangular
dependency pattern (host-side); rows in a level are mutually independent.
The per-level update bodies are the format-dispatched sweep kernels from
ops/sweeps.py, so the exact paths work for padded-CSR and DIA storage alike.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sweeps import (
    bgs_sweep,
    block_bgs_sweep,
    block_fgs_sweep,
    block_unit_lower_sweep,
    block_upper_solve_sweep,
    fgs_sweep,
    unit_lower_sweep,
    upper_solve_sweep,
)

__all__ = [
    "compute_levels_lower", "compute_levels_upper", "level_loop",
    "exact_lower_solve", "exact_upper_solve",
    "exact_block_lower_solve", "exact_block_upper_solve",
    "exact_fgs", "exact_bgs", "exact_block_fgs", "exact_block_bgs",
]


def compute_levels_lower(rowptr, colind) -> np.ndarray:
    """Level (wavefront depth) of each row for forward substitution:
    level[i] = 1 + max(level[c]) over strictly-lower neighbours c
    (host-side; reference: levelschedule.cpp:11-71 computes the equivalent
    consecutive-peeling partition)."""
    from .. import native

    out = native.levels_lower(rowptr, colind)
    if out is not None:
        return out
    rowptr = np.asarray(rowptr)
    colind = np.asarray(colind)
    n = rowptr.shape[0] - 1
    level = np.zeros(n, dtype=np.int32)
    for i in range(n):
        cols = colind[rowptr[i]:rowptr[i + 1]]
        deps = cols[cols < i]
        if deps.size:
            level[i] = level[deps].max() + 1
    return level


def compute_levels_upper(rowptr, colind) -> np.ndarray:
    """Levels for backward substitution (dependencies are upper neighbours)."""
    from .. import native

    out = native.levels_upper(rowptr, colind)
    if out is not None:
        return out
    rowptr = np.asarray(rowptr)
    colind = np.asarray(colind)
    n = rowptr.shape[0] - 1
    level = np.zeros(n, dtype=np.int32)
    for i in range(n - 1, -1, -1):
        cols = colind[rowptr[i]:rowptr[i + 1]]
        deps = cols[cols > i]
        if deps.size:
            level[i] = level[deps].max() + 1
    return level


def level_loop(nlevels: int, level_of_row: jax.Array, update_fn, x0: jax.Array):
    """Run ``update_fn`` once per level, committing only that level's rows."""

    def body(lev, x):
        xn = update_fn(x)
        mask = level_of_row == lev
        if x.ndim > 1:
            mask = mask[:, None]
        return jnp.where(mask, xn, x)

    return jax.lax.fori_loop(0, nlevels, body, x0)


# ------------------------------------------------------------- triangular ----

def exact_lower_solve(A, vals, z, levels, nlevels: int) -> jax.Array:
    """Exact unit-lower solve L y = z by wavefronts
    (reference sequential path: solverops_ilu0.cpp:274-283 with 1 thread)."""
    return level_loop(nlevels, levels,
                      lambda y: unit_lower_sweep(A, vals, z, y),
                      jnp.zeros_like(z))


def exact_upper_solve(A, vals, dinv, y, levels, nlevels: int) -> jax.Array:
    """Exact upper solve U z = y (non-unit diag given pre-inverted)."""
    return level_loop(nlevels, levels,
                      lambda z: upper_solve_sweep(A, vals, dinv, y, z),
                      jnp.zeros_like(y))


def exact_block_lower_solve(A, vals, z, levels, nlevels: int) -> jax.Array:
    return level_loop(nlevels, levels,
                      lambda y: block_unit_lower_sweep(A, vals, z, y),
                      jnp.zeros_like(z))


def exact_block_upper_solve(A, vals, dinv, y, levels, nlevels: int) -> jax.Array:
    return level_loop(nlevels, levels,
                      lambda z: block_upper_solve_sweep(A, vals, dinv, y, z),
                      jnp.zeros_like(y))


# -------------------------------------------------------------------- GS ----

def exact_fgs(A, dinv, r, y0, levels, nlevels: int) -> jax.Array:
    """One exact forward GS sweep: y_i = D⁻¹(r − L y)_i in dependency order
    (reference: solverops_levels_sgs.cpp:67-86)."""
    return level_loop(nlevels, levels, lambda y: fgs_sweep(A, dinv, r, y), y0)


def exact_bgs(A, dinv, y, z0, levels, nlevels: int) -> jax.Array:
    """One exact backward sweep: z_i = y_i − D⁻¹(U z)_i in reverse order."""
    return level_loop(nlevels, levels, lambda z: bgs_sweep(A, dinv, y, z), z0)


def exact_block_fgs(A, dinv, r, y0, levels, nlevels: int) -> jax.Array:
    return level_loop(nlevels, levels,
                      lambda y: block_fgs_sweep(A, dinv, r, y), y0)


def exact_block_bgs(A, dinv, y, z0, levels, nlevels: int) -> jax.Array:
    return level_loop(nlevels, levels,
                      lambda z: block_bgs_sweep(A, dinv, y, z), z0)
