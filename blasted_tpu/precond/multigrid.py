"""Algebraic multigrid preconditioner with blasted smoothers per level.

The reference's solver-stack walker attaches a BLASTed operator to *every
level* of a PETSc multigrid hierarchy — PCMG/PCGAMG per-level smoothers plus
the coarse solve (reference: setup_blasted_stack_ext PCMG/PCGAMG branch,
src/blasted_petsc.cpp:610-630).  There the hierarchy itself belongs to PETSc;
here the whole stack is in-framework, so this module provides the hierarchy
too: an aggregation AMG in the style the walker targets, whose per-level
smoothers are factory-built blasted operators (Jacobi/SGS/ILU0/...) and whose
coarsest level is an exact dense solve.

TPU-native design
-----------------
- **Contiguous aggregation**: aggregate ``group`` *consecutive* rows.  In a
  banded / RCM ordering (the DIA fast path, CLAUDE.md) consecutive rows are
  near neighbours in the underlying graph, so piecewise-constant vectors
  over index blocks are a legitimate tentative space (this is the
  pairwise-aggregation family of Notay's AGMG, with pair size ``group``).
  The payoff is the transfer operators: prolongation is ``repeat`` and
  restriction is ``reshape + sum`` — **zero gathers**, the operation XLA
  lowers to ~8 ns/element scalar code on TPU (RESULTS.md).
- **Band-preserving Galerkin**: ``A_c = Pᵀ A P`` of a banded matrix under
  contiguous aggregation is banded with bandwidth ≈ band/g + 1, so *every*
  level of the hierarchy stays on the gather-free DIA kernels
  (``factory.to_device_matrix`` auto-detects per level).
- **Host-side setup**: the hierarchy (scipy triple products, spectral-radius
  estimate for the smoothed prolongator) is symbolic preprocessing, computed
  once and cached — the same split the reference uses for ILU positions and
  level schedules (solverops_ilu0.cpp:193-196).
- **Device-side cycle**: the V/W-cycle is a static unrolled recursion over
  the (fixed) levels; smoothing steps are Richardson iterations
  ``x ← x + M⁻¹(b − A x)`` with any :class:`Preconditioner` as ``M`` — one
  traced XLA computation end to end, jit/vmap-safe, usable inside the
  ``lax.while_loop`` Krylov drivers.

Because the cycle is a fixed linear operator (fixed sweep counts, exact
coarse solve), plain CG/BiCGSTAB work as outer methods; with tolerance-based
smoothers use the flexible :func:`~blasted_tpu.solvers.gcr`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AsyncSolverSettings, PrecType
from ..ops.spmv import spmv
from ..sparse.csr import CSRMatrix
from .base import Preconditioner, PrecInfo

__all__ = ["AMGSettings", "MultigridPreconditioner", "build_hierarchy",
           "aggregation_prolongator", "brick_prolongator"]


@dataclass(frozen=True)
class AMGSettings:
    """Hierarchy + cycle knobs.

    ``smoother`` settings are handed to the factory per level (the analogue
    of the reference walker configuring one Blasted_data context per MG
    level, blasted_petsc.cpp:610-630).
    """

    group: int = 4                # rows per aggregate (AGMG double-pairs ≙ 4)
    # structured grids: isotropic brick aggregation instead of index blocks.
    # grid_shape = interior points (nx, ny, nz), x-fastest ordering (the
    # Poisson generator's / DMDA natural ordering); transfers stay pure
    # reshapes (zero gathers) and iteration counts stay mesh-independent,
    # where deep 1-D index-block coarsening degrades (semicoarsening).
    grid_shape: tuple | None = None
    brick: tuple = (2, 2, 2)
    max_levels: int = 12
    coarse_size: int = 200       # switch to the exact dense solve below this
    cycle: str = "v"             # "v" or "w"
    npre: int = 1                # pre-smoothing steps
    npost: int = 1               # post-smoothing steps
    smooth_prolongator: bool = False   # damped-Jacobi smoothed P (classic SA)
    omega_scale: float = 4.0 / 3.0     # SA damping = omega_scale / rho(D^-1 A)
    # level smoothing: "factory" wraps any blasted operator (settings below)
    # in Richardson steps; "jacobi" is damped point Jacobi with per-level
    # ω = jacobi_omega/ρ(D⁻¹A) — the cheapest pure-streaming smoother, the
    # best measured time-to-solution on TPU; "chebyshev" is the classic
    # polynomial smoother (cheby_degree SpMVs per step, no triangular work)
    smoother_kind: str = "factory"
    jacobi_omega: float = 1.4          # damping × 1/ρ(D⁻¹A)
    cheby_degree: int = 2
    smoother: AsyncSolverSettings = field(
        default_factory=lambda: AsyncSolverSettings(
            prec_type=PrecType.SGS, napplysweeps=2))


def aggregation_prolongator(n: int, group: int, A_sp=None,
                            smooth: bool = False,
                            omega_scale: float = 4.0 / 3.0):
    """Host-side prolongator for contiguous size-``group`` aggregates.

    Returns ``(P, omega)`` as ``(scipy.sparse.csr_matrix, float)``; ``omega``
    is 0.0 for the unsmoothed (piecewise-constant) tentative operator, else
    the damped-Jacobi weight of the smoothed prolongator
    ``P = (I − ω D⁻¹ A) T`` with ``ω = omega_scale / ρ(D⁻¹A)``, where ρ is
    the Gershgorin row-sum upper bound (see :func:`_rho_dinv_a` for why an
    upper bound, not a power-iteration estimate, is required).
    """
    import scipy.sparse as sps

    nc = -(-n // group)
    rows = np.arange(n, dtype=np.int64)
    cols = rows // group
    T = sps.csr_matrix((np.ones(n), (rows, cols)), shape=(n, nc))
    if not smooth:
        return T, 0.0
    return _smooth_prolongator(T, A_sp, omega_scale)


def _rho_dinv_a(A_sp) -> float:
    """Safe upper bound on ρ(D⁻¹A): the Gershgorin row-sum bound
    max_i Σ_j |a_ij|/|a_ii| (= 2 exactly for M-matrix stencils).

    An *upper* bound is required: Chebyshev smoothing amplifies modes above
    its interval, and a short power iteration underestimates ρ when the
    spectrum clusters (measured: 1.62 vs true ≈2 on the Poisson stencil,
    turning the Chebyshev-smoothed cycle divergent)."""
    d = A_sp.diagonal()
    if np.any(d == 0):
        raise ValueError("Jacobi-scaled smoothing needs a zero-free diagonal")
    absrow = np.asarray(abs(A_sp).sum(axis=1)).ravel()
    return float(np.max(absrow / np.abs(d)))


def _smooth_prolongator(T, A_sp, omega_scale: float):
    """Damped-Jacobi smoothing of a tentative prolongator:
    ``P = (I − ω D⁻¹ A) T`` with ``ω = omega_scale / ρ(D⁻¹A)``."""
    import scipy.sparse as sps

    omega = omega_scale / _rho_dinv_a(A_sp)
    Dinv = sps.diags(1.0 / A_sp.diagonal())
    P = (T - omega * ((Dinv @ A_sp) @ T)).tocsr()
    return P, omega


def brick_prolongator(shape: tuple, brick: tuple):
    """Host-side tentative prolongator for ``brick`` aggregation of a
    structured grid with x-fastest natural ordering.

    Returns ``(T, coarse_shape)``; every dim of ``shape`` must be divisible
    by the corresponding brick edge.
    """
    import scipy.sparse as sps

    nx, ny, nz = shape
    bx, by, bz = brick
    if nx % bx or ny % by or nz % bz:
        raise ValueError(f"grid {shape} not divisible by brick {brick}")
    cx, cy, cz = nx // bx, ny // by, nz // bz
    i, j, k = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    rows = (i + nx * j + nx * ny * k).reshape(-1)
    cols = ((i // bx) + cx * (j // by) + cx * cy * (k // bz)).reshape(-1)
    n, ncoarse = nx * ny * nz, cx * cy * cz
    T = sps.csr_matrix((np.ones(n), (rows, cols)), shape=(n, ncoarse))
    return T, (cx, cy, cz)


class _Level(NamedTuple):
    """Static per-level data (host) + device operators."""

    n: int
    nc: int
    group: int
    A_dev: object                 # DiaMatrix or PaddedCSR
    AT_dev: object | None         # for the smoothed-restriction transpose
    smoother: Preconditioner | None
    omega: float
    dinv: jax.Array | None
    shape: tuple | None = None    # structured-grid mode: fine (nx, ny, nz)
    brick: tuple | None = None    # and the brick edges (bx, by, bz)
    rho: float = 0.0              # ρ(D⁻¹A) estimate (jacobi/chebyshev kinds)


def _to_scipy_csr(mat):
    """Accept CSRMatrix / BSRMatrix / scipy; flatten blocks to scalar CSR
    (the hierarchy is scalar; the reference MG path likewise receives
    whatever scalar operators PETSc's GAMG built)."""
    import scipy.sparse as sps

    if isinstance(mat, CSRMatrix):
        return mat.to_scipy().tocsr()
    if hasattr(mat, "to_scipy"):
        return sps.csr_matrix(mat.to_scipy())
    return sps.csr_matrix(mat)


def build_hierarchy(A0, settings: AMGSettings):
    """Build the level list + dense coarsest operator (host-side, once).

    Returns ``(levels, A_coarse_dense)`` where ``levels`` is a list of
    :class:`_Level` whose ``A_dev`` is the best device format per level
    (DIA when banded — contiguous aggregation preserves bandedness).
    """
    import scipy.sparse as sps

    from ..factory import create_preconditioner, to_device_matrix

    A_sp = _to_scipy_csr(A0)
    levels = []
    g = settings.group
    shape = settings.grid_shape
    brick = settings.brick
    if shape is not None and int(np.prod(shape)) != A_sp.shape[0]:
        raise ValueError(f"grid_shape {shape} does not match "
                         f"nrows {A_sp.shape[0]}")
    while (A_sp.shape[0] > settings.coarse_size
           and len(levels) < settings.max_levels - 1):
        n = A_sp.shape[0]
        cur_shape = cur_brick = None
        if shape is not None and all(
                s % b == 0 for s, b in zip(shape, brick)):
            cur_shape, cur_brick = shape, brick
            T, coarse_shape = brick_prolongator(shape, brick)
            if settings.smooth_prolongator:
                P, omega = _smooth_prolongator(
                    T, A_sp, settings.omega_scale)
            else:
                P, omega = T, 0.0
            grp = int(np.prod(brick))
            shape = coarse_shape
        else:
            shape = None   # fell off the structured path; index blocks onward
            grp = g
            P, omega = aggregation_prolongator(
                n, g, A_sp, smooth=settings.smooth_prolongator,
                omega_scale=settings.omega_scale)
        Ac = (P.T @ A_sp @ P).tocsr()
        Ac.eliminate_zeros()
        Ac.sort_indices()

        A_host = CSRMatrix.from_scipy(A_sp)
        A_dev = to_device_matrix(A_host)
        kind = settings.smoother_kind
        smoother = (create_preconditioner(A_dev, settings.smoother)
                    if kind == "factory" else None)
        if kind not in ("factory", "jacobi", "chebyshev"):
            raise ValueError(f"unknown smoother_kind {kind!r}")
        rho = _rho_dinv_a(A_sp) if kind in ("jacobi", "chebyshev") else 0.0
        dinv = jnp.asarray(1.0 / A_sp.diagonal())
        AT_dev = None
        if omega != 0.0:
            asym = abs(A_sp - A_sp.T)
            if asym.nnz and asym.max() > 1e-12 * abs(A_sp).max():
                AT_dev = to_device_matrix(
                    CSRMatrix.from_scipy(A_sp.T.tocsr()))
        levels.append(_Level(n=n, nc=P.shape[1], group=grp, A_dev=A_dev,
                             AT_dev=AT_dev, smoother=smoother, omega=omega,
                             dinv=dinv, shape=cur_shape, brick=cur_brick,
                             rho=rho))
        A_sp = Ac

    A_coarse = jnp.asarray(A_sp.toarray())
    return levels, A_coarse


def _prolong(lev: _Level, xc: jax.Array) -> jax.Array:
    """P @ xc with zero gathers: repeat (index blocks) or 3-D broadcast
    (grid bricks), + optional damped-Jacobi smoothing."""
    if lev.shape is not None:
        nx, ny, nz = lev.shape
        bx, by, bz = lev.brick
        cx, cy, cz = nx // bx, ny // by, nz // bz
        y = jnp.broadcast_to(xc.reshape(cz, 1, cy, 1, cx, 1),
                             (cz, bz, cy, by, cx, bx)).reshape(-1)
    else:
        y = jnp.broadcast_to(xc[:, None],
                             (lev.nc, lev.group)).reshape(-1)[:lev.n]
    if lev.omega != 0.0:
        y = y - lev.omega * lev.dinv * spmv(lev.A_dev, y)
    return y


def _restrict(lev: _Level, r: jax.Array) -> jax.Array:
    """Pᵀ @ r with zero gathers: optional smoothing transpose + reshape-sum."""
    if lev.omega != 0.0:
        At = lev.AT_dev if lev.AT_dev is not None else lev.A_dev
        r = r - lev.omega * spmv(At, lev.dinv * r)
    if lev.shape is not None:
        nx, ny, nz = lev.shape
        bx, by, bz = lev.brick
        return r.reshape(nz // bz, bz, ny // by, by, nx // bx, bx) \
                .sum(axis=(1, 3, 5)).reshape(-1)
    pad = lev.nc * lev.group - lev.n
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad,), r.dtype)])
    return r.reshape(lev.nc, lev.group).sum(axis=1)


class MultigridPreconditioner(Preconditioner):
    """AMG V/W-cycle as a :class:`Preconditioner` — the in-framework
    equivalent of a PETSc MG stack with blasted smoothers on every level
    (reference: blasted_petsc.cpp:610-630).

    ``apply(r)``: one cycle from a zero initial guess (a fixed linear
    operator).  ``apply_relax(b, x)``: ``solveparams.maxits`` cycles from
    ``x`` — multigrid as the standalone iteration, the Richardson-path
    analogue.  Operates on flat scalar vectors; block (BSR) inputs are
    flattened for the hierarchy (their block structure still shapes the
    aggregates when ``group`` is a multiple of ``bs``).
    """

    def __init__(self, mat, settings: AMGSettings | None = None):
        self.mat = mat
        self.state = None
        self.settings = settings or AMGSettings()
        if self.settings.cycle not in ("v", "w"):
            raise ValueError(f"unknown cycle type {self.settings.cycle!r}")
        self.levels: list[_Level] = []
        self._coarse_lu = None
        self._values_version = 0
        self._built_version = -1
        from .base import SolveParams
        self.solveparams = SolveParams()

    @property
    def block_size(self) -> int:
        return 1  # cycle runs on flat vectors regardless of input blocking

    def update_values(self, vals) -> None:
        """New numerical values for the fine operator (flat nnz array, see
        precond/base.py).  The next :meth:`compute` rebuilds the Galerkin
        chain and level operators from the new values (the reference
        refreshes numerics every compute_preconditioner call,
        blasted_petsc.cpp:314-327); plain repeated compute() without an
        update keeps the cached hierarchy."""
        self.mat = self.mat.with_vals(jnp.asarray(vals))
        self._values_version += 1

    def compute(self) -> PrecInfo:
        if not self.levels or self._built_version != self._values_version:
            # hierarchy (re)build: cached across compute() calls, invalidated
            # by update_values (ADVICE r1: stale level operators)
            self.levels, self._A_coarse = build_hierarchy(
                self.mat, self.settings)
            self._built_version = self._values_version
        info = PrecInfo()
        for li, lev in enumerate(self.levels):   # numeric smoother factorizations
            if lev.smoother is None:   # jacobi/chebyshev kinds: dinv-only
                continue
            lev_info = lev.smoother.compute()
            if li == 0:               # report the fine level's diagnostics
                info = lev_info
        self._coarse_lu = jax.scipy.linalg.lu_factor(self._A_coarse)
        return info

    # -- the cycle -----------------------------------------------------------

    def _smooth(self, lev: _Level, b, x, steps: int):
        s = self.settings
        if s.smoother_kind == "jacobi":
            om = s.jacobi_omega / lev.rho
            for _ in range(steps):
                x = x + om * lev.dinv * (b - spmv(lev.A_dev, x))
            return x
        if s.smoother_kind == "chebyshev":
            # Chebyshev on D⁻¹A over [ρ/4, ρ] (standard smoothing interval)
            lmax = lev.rho * 1.05
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            for _ in range(steps):
                sigma = theta / delta
                rho_c = 1.0 / sigma
                d = lev.dinv * (b - spmv(lev.A_dev, x)) / theta
                x = x + d
                for _ in range(s.cheby_degree - 1):
                    rho_new = 1.0 / (2.0 * sigma - rho_c)
                    r = lev.dinv * (b - spmv(lev.A_dev, x))
                    d = rho_new * rho_c * d + (2.0 * rho_new / delta) * r
                    x = x + d
                    rho_c = rho_new
            return x
        for _ in range(steps):
            x = x + lev.smoother.apply_flat(b - spmv(lev.A_dev, x))
        return x

    def _cycle(self, li: int, b: jax.Array, x: jax.Array) -> jax.Array:
        if li == len(self.levels):
            return jax.scipy.linalg.lu_solve(self._coarse_lu, b)
        lev = self.levels[li]
        s = self.settings
        x = self._smooth(lev, b, x, s.npre)
        r = b - spmv(lev.A_dev, x)
        rc = _restrict(lev, r)
        ec = jnp.zeros((lev.nc,), b.dtype)
        ngamma = 1 if (s.cycle == "v" or li + 1 == len(self.levels)) else 2
        for _ in range(ngamma):
            ec = self._cycle(li + 1, rc, ec)
        x = x + _prolong(lev, ec)
        return self._smooth(lev, b, x, s.npost)

    # -- the reference triad --------------------------------------------------

    def apply(self, r: jax.Array) -> jax.Array:
        return self._cycle(0, r, jnp.zeros_like(r))

    def apply_flat(self, r: jax.Array) -> jax.Array:
        return self.apply(r)

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        from .jacobi import relax_loop
        return relax_loop(lambda bb, xx: self._cycle(0, bb, xx),
                          b, x, self.solveparams)
