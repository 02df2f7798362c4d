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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmv import block_matvec
from ..ops.sweeps import _bmasked, _masked
from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR

__all__ = [
    "compute_levels_lower", "compute_levels_upper",
    "exact_lower_solve", "exact_upper_solve",
    "exact_block_lower_solve", "exact_block_upper_solve",
    "exact_fgs", "exact_bgs", "exact_block_fgs", "exact_block_bgs",
]


def compute_levels_lower(rowptr, colind) -> np.ndarray:
    """Level (wavefront depth) of each row for forward substitution:
    level[i] = 1 + max(level[c]) over strictly-lower neighbours c
    (host-side; reference: levelschedule.cpp:11-71 computes the equivalent
    consecutive-peeling partition)."""
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


def _level_loop(nlevels: int, level_of_row: jax.Array, update_fn, x0: jax.Array):
    """Run ``update_fn`` once per level, committing only that level's rows."""

    def body(lev, x):
        xn = update_fn(x)
        mask = level_of_row == lev
        if x.ndim > 1:
            mask = mask[:, None]
        return jnp.where(mask, xn, x)

    return jax.lax.fori_loop(0, nlevels, body, x0)


# ------------------------------------------------------------- triangular ----

def exact_lower_solve(A: PaddedCSR, vals_pad: jax.Array, z: jax.Array,
                      levels: jax.Array, nlevels: int) -> jax.Array:
    """Exact unit-lower solve L y = z by wavefronts
    (reference sequential path: solverops_ilu0.cpp:274-283 with 1 thread)."""

    def upd(y):
        gy = A.gather_x(y)
        return z - jnp.sum(_masked(vals_pad, A.lower_mask) * gy, axis=1)

    return _level_loop(nlevels, levels, upd, jnp.zeros_like(z))


def exact_upper_solve(A: PaddedCSR, vals_pad: jax.Array, dinv: jax.Array,
                      y: jax.Array, levels: jax.Array, nlevels: int) -> jax.Array:
    """Exact upper solve U z = y (non-unit diag given pre-inverted)."""

    def upd(z):
        gz = A.gather_x(z)
        return dinv * (y - jnp.sum(_masked(vals_pad, A.upper_mask) * gz, axis=1))

    return _level_loop(nlevels, levels, upd, jnp.zeros_like(y))


def exact_block_lower_solve(A: PaddedBSR, vals_pad: jax.Array, z: jax.Array,
                            levels: jax.Array, nlevels: int) -> jax.Array:
    def upd(y):
        gy = A.gather_x(y)
        return z - block_matvec(_bmasked(vals_pad, A.lower_mask), gy)

    return _level_loop(nlevels, levels, upd, jnp.zeros_like(z))


def exact_block_upper_solve(A: PaddedBSR, vals_pad: jax.Array, dinv: jax.Array,
                            y: jax.Array, levels: jax.Array, nlevels: int) -> jax.Array:
    def upd(z):
        gz = A.gather_x(z)
        s = y - block_matvec(_bmasked(vals_pad, A.upper_mask), gz)
        return jnp.einsum("rij,rj->ri", dinv, s, preferred_element_type=s.dtype)

    return _level_loop(nlevels, levels, upd, jnp.zeros_like(y))


# -------------------------------------------------------------------- GS ----

def exact_fgs(A: PaddedCSR, dinv: jax.Array, r: jax.Array, y0: jax.Array,
              levels: jax.Array, nlevels: int) -> jax.Array:
    """One exact forward GS sweep: y_i = D⁻¹(r − L y)_i in dependency order
    (reference: solverops_levels_sgs.cpp:67-86)."""

    def upd(y):
        gy = A.gather_x(y)
        return dinv * (r - jnp.sum(_masked(A.vals_pad, A.lower_mask) * gy, axis=1))

    return _level_loop(nlevels, levels, upd, y0)


def exact_bgs(A: PaddedCSR, dinv: jax.Array, y: jax.Array, z0: jax.Array,
              levels: jax.Array, nlevels: int) -> jax.Array:
    """One exact backward sweep: z_i = y_i − D⁻¹(U z)_i in reverse order."""

    def upd(z):
        gz = A.gather_x(z)
        return y - dinv * jnp.sum(_masked(A.vals_pad, A.upper_mask) * gz, axis=1)

    return _level_loop(nlevels, levels, upd, z0)


def exact_block_fgs(A: PaddedBSR, dinv: jax.Array, r: jax.Array, y0: jax.Array,
                    levels: jax.Array, nlevels: int) -> jax.Array:
    def upd(y):
        gy = A.gather_x(y)
        s = r - block_matvec(_bmasked(A.vals_pad, A.lower_mask), gy)
        return jnp.einsum("rij,rj->ri", dinv, s, preferred_element_type=s.dtype)

    return _level_loop(nlevels, levels, upd, y0)


def exact_block_bgs(A: PaddedBSR, dinv: jax.Array, y: jax.Array, z0: jax.Array,
                    levels: jax.Array, nlevels: int) -> jax.Array:
    def upd(z):
        gz = A.gather_x(z)
        s = block_matvec(_bmasked(A.vals_pad, A.upper_mask), gz)
        return y - jnp.einsum("rij,rj->ri", dinv, s, preferred_element_type=s.dtype)

    return _level_loop(nlevels, levels, upd, z0)
