"""Distributed multigrid: a global AMG hierarchy with shard-local smoothers.

This is the distributed shape of the reference's multigrid usage: PETSc owns
a *global* MG hierarchy and BLASTed supplies the *rank-local* smoother at
every level — ``PCMG``/``PCGAMG`` with per-level ``bjacobi + shell`` sub-
preconditioners, which the stack walker wires up by recursing into each
level's smoother KSP (reference: setup_blasted_stack_ext PCMG/PCGAMG branch,
src/blasted_petsc.cpp:610-630).  Re-expressed TPU-natively:

- every level's operator is **row-sharded** over the mesh (the PETSc row
  partition), and its residual SpMV is the existing distributed SpMV
  (:func:`~blasted_tpu.parallel.dist.dist_spmv`, all-gather over ICI);
- every level's smoother is a :class:`LocalBlockPreconditioner` — each
  device smooths its diagonal block with zero communication inside the
  apply, i.e. block-Jacobi-of-local-blasted, exactly the reference's
  per-rank smoothing semantics;
- the transfer operators are the contiguous-aggregation repeat / reshape-sum
  of :mod:`blasted_tpu.precond.multigrid` applied to row-sharded global
  arrays: aggregates never straddle shard boundaries when the shard size is
  a multiple of ``group``, so XLA partitions them with **no communication**;
- the coarsest level is a replicated dense LU solve (small by construction).

Like the reference's bjacobi smoothing, the preconditioner's action depends
on the shard count (more shards = weaker local smoothing); convergence-rate
parity across shard counts is therefore statistical, not bitwise — the same
posture as the reference's MPIPetsc comparisons (SURVEY.md §4.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import AsyncSolverSettings, PrecType
from ..precond.multigrid import AMGSettings, aggregation_prolongator
from ..sparse.csr import CSRMatrix
from .dist import (
    LocalBlockPreconditioner,
    dist_spmv,
    row_axes,
    shard_dist_csr,
    shard_vector,
)
from .partition import partition_csr

__all__ = ["DistMGSolver"]


class _DistLevel:
    def __init__(self, n: int, nc: int, group: int, dA, smoother):
        self.n = n
        self.nc = nc
        self.group = group
        self.dA = dA
        self.smoother = smoother


class DistMGSolver:
    """Distributed AMG-preconditioned Krylov driver (drop-in peer of
    :class:`~blasted_tpu.parallel.dist.DistributedSolver`)."""

    def __init__(self, A: CSRMatrix, mesh: Mesh,
                 settings: AMGSettings | None = None):
        self.mesh = mesh
        self.settings = settings or AMGSettings()
        if self.settings.smooth_prolongator:
            raise ValueError("distributed amg supports the unsmoothed "
                             "(piecewise-constant) prolongator only")
        nshards = mesh.devices.size
        g = self.settings.group

        # host-side hierarchy (scipy Galerkin chain).  Uneven sizes are
        # identity-padded up to a multiple of nshards·group so the fine
        # level both row-partitions evenly and aggregates shard-locally
        # (decoupled identity rows perturb nothing: their residuals enter
        # the cycle as zeros and the padded system's solution is the
        # original one extended by zeros — cf. partition.pad_csr_identity).
        A_sp = A.to_scipy().tocsr()
        self.n_orig = A_sp.shape[0]
        q = nshards * g
        n_pad = -(-self.n_orig // q) * q
        if n_pad != self.n_orig:
            import scipy.sparse as sps
            A_sp = sps.block_diag(
                [A_sp, sps.identity(n_pad - self.n_orig, dtype=A_sp.dtype,
                                    format="csr")], format="csr")
            A_sp.sort_indices()
        chain = [A_sp]
        while (chain[-1].shape[0] > self.settings.coarse_size
               and len(chain) < self.settings.max_levels):
            n = chain[-1].shape[0]
            m = n // nshards
            if n % g or m % g or (n // g) % nshards:
                break   # stop coarsening; current level becomes the coarse
            P, _ = aggregation_prolongator(n, g, chain[-1], smooth=False)
            Ac = (P.T @ chain[-1] @ P).tocsr()
            Ac.eliminate_zeros()
            Ac.sort_indices()
            chain.append(Ac)

        self.levels: list[_DistLevel] = []
        for A_l in chain[:-1]:
            dA = shard_dist_csr(mesh, partition_csr(
                CSRMatrix.from_scipy(A_l), nshards))
            sm = LocalBlockPreconditioner(
                mesh, dA, self.settings.smoother).compute()
            n = A_l.shape[0]
            self.levels.append(_DistLevel(n=n, nc=n // g, group=g,
                                          dA=dA, smoother=sm))
        self._A_coarse = jnp.asarray(chain[-1].toarray())
        self._coarse_lu = jax.scipy.linalg.lu_factor(self._A_coarse)
        # coarse-only degenerate case (problem too small to coarsen): the
        # operator is still the distributed fine SpMV; the "cycle" is the
        # replicated dense solve
        self._dA_fine = (self.levels[0].dA if self.levels else
                         shard_dist_csr(mesh, partition_csr(
                             CSRMatrix.from_scipy(chain[0]), nshards)))

    # -- the cycle on row-sharded global arrays ------------------------------

    def _spmv(self, lev: _DistLevel, x: jax.Array) -> jax.Array:
        return dist_spmv(self.mesh, lev.dA.colind, lev.dA.vals_pad, x)

    def _smooth(self, lev: _DistLevel, b, x, steps: int):
        for _ in range(steps):
            x = x + lev.smoother.apply(b - self._spmv(lev, x))
        return x

    def _cycle(self, li: int, b: jax.Array, x: jax.Array) -> jax.Array:
        if li == len(self.levels):
            # replicated dense coarse solve; XLA gathers/broadcasts as needed
            return jax.scipy.linalg.lu_solve(self._coarse_lu, b)
        lev = self.levels[li]
        s = self.settings
        x = self._smooth(lev, b, x, s.npre)
        r = b - self._spmv(lev, x)
        rc = r.reshape(lev.nc, lev.group).sum(axis=1)       # shard-local
        ec = jnp.zeros((lev.nc,), b.dtype)
        ngamma = 1 if (s.cycle == "v" or li + 1 == len(self.levels)) else 2
        for _ in range(ngamma):
            ec = self._cycle(li + 1, rc, ec)
        x = x + jnp.broadcast_to(                           # shard-local
            ec[:, None], (lev.nc, lev.group)).reshape(-1)
        return self._smooth(lev, b, x, s.npost)

    # -- driver interface (peer of DistributedSolver) ------------------------

    def amat(self, x: jax.Array) -> jax.Array:
        return dist_spmv(self.mesh, self._dA_fine.colind,
                         self._dA_fine.vals_pad, x)

    def prec_apply(self, r: jax.Array) -> jax.Array:
        return self._cycle(0, r, jnp.zeros_like(r))

    def solve(self, b, x0=None, method: str = "cg", tol: float = 1e-8,
              maxiter: int = 500, **kw):
        from ..solvers import bicgstab, cg, gcr, richardson

        solver = {"bicgstab": bicgstab, "cg": cg, "gcr": gcr,
                  "richardson": richardson}[method]
        from .dist import _zero_pad

        n = self.levels[0].n if self.levels else self._A_coarse.shape[0]
        b = shard_vector(self.mesh, _zero_pad(jnp.asarray(b), n))
        x0 = (shard_vector(self.mesh, _zero_pad(jnp.asarray(x0), n))
              if x0 is not None else jnp.zeros_like(b))
        x, info = solver(self.amat, self.prec_apply, b, x0,
                         tol=tol, maxiter=maxiter, **kw)
        if self.n_orig != n:
            x = x[:self.n_orig]
        return x, info
