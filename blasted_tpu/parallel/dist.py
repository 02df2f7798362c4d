"""Distributed (multi-device) SpMV, local preconditioners, and solve drivers.

TPU-native re-expression of the reference's MPI/PETSc domain decomposition
(SURVEY.md §2.5 P8; reference: blasted_petsc.cpp:229-298):

- rows are sharded over a 1-D ``Mesh`` axis ``"rows"`` (the analogue of the
  PETSc row partition over ranks),
- the distributed SpMV gathers off-shard x entries with collectives riding
  ICI — either a tiled ``all_gather`` (general matrices) or a neighbour
  ``ppermute`` halo exchange (banded matrices, the common FD/CFD case),
- the *preconditioner is local*: each device applies a shard-local operator
  to its diagonal block with zero communication inside the apply — exactly
  the reference's block-Jacobi/ASM-with-local-BLASTed semantics,
- Krylov dot products on row-sharded global arrays reduce with ``psum``
  inserted by XLA (the solvers from :mod:`blasted_tpu.solvers` run unchanged).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ApplyInit, AsyncSolverSettings, PrecType
from ..factory import create_preconditioner
from ..sparse.bsr import BSRMatrix
from ..sparse.csr import CSRMatrix, PaddedCSR
from .partition import DistBSR, DistCSR, partition_bsr, partition_csr

__all__ = ["make_mesh", "row_axes", "shard_vector", "dist_spmv",
           "dist_bspmv", "dist_spmv_ghost", "dist_bspmv_ghost",
           "LocalBlockPreconditioner", "DistributedSolver"]


def make_mesh(n_devices: int | None = None, devices=None,
              shape=None, axes=None) -> Mesh:
    """1-D row mesh by default; pass ``shape=(nhosts, nchips)`` (with default
    ``axes=("dcn", "ici")``) for a multi-host topology — every distributed
    component row-shards over *all* mesh axes flattened (see :func:`row_axes`),
    so the same code rides ICI within a slice and DCN across slices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.array(devices)
    if shape is not None:
        devices = devices.reshape(shape)
    if axes is None:
        axes = ("rows",) if devices.ndim == 1 else ("dcn", "ici")[:devices.ndim]
    if len(axes) != devices.ndim:
        raise ValueError(f"{len(axes)} axis names for a {devices.ndim}-D mesh")
    return Mesh(devices, tuple(axes))


def row_axes(mesh: Mesh) -> tuple:
    """The mesh axes rows are sharded over: all of them, flattened.
    Collectives take this tuple directly (ppermute/all_gather/psum treat it
    as one linearised axis, DCN-major)."""
    return tuple(mesh.axis_names)


def shard_vector(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(jnp.asarray(x),
                          NamedSharding(mesh, P(row_axes(mesh))))


def _zero_pad(x, n: int):
    """Zero-extend a vector to the identity-padded global length."""
    x = jnp.asarray(x)
    if x.shape[0] == n:
        return x
    return jnp.concatenate([x, jnp.zeros((n - x.shape[0],) + x.shape[1:],
                                         x.dtype)])


def shard_dist_csr(mesh: Mesh, dA):
    """Place the partitioned matrix (DistCSR or DistBSR) on the mesh: global
    row arrays sharded on axis 0; stacked local blocks and the ghost
    exchange plan (one row of each ``send_parts`` per source shard) on the
    shard axis."""
    ax = row_axes(mesh)

    def put(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*((ax,) + (None,) * (a.ndim - 1)))))

    local = jax.tree_util.tree_map(put, dA.local)
    return type(dA)(colind=put(dA.colind), vals_pad=put(dA.vals_pad),
                    local=local, nshards=dA.nshards,
                    ghost_colind=None if dA.ghost_colind is None
                    else put(dA.ghost_colind),
                    send_parts=tuple(put(s) for s in dA.send_parts),
                    ghost_deltas=dA.ghost_deltas, nrows_orig=dA.nrows_orig)


shard_dist_bsr = shard_dist_csr  # same placement logic, block shapes


def dist_spmv(mesh: Mesh, colind: jax.Array, vals_pad: jax.Array,
              x: jax.Array) -> jax.Array:
    """y = A x with row-sharded A and x.

    Off-shard x entries are fetched with one tiled ``all_gather`` over the
    ``rows`` axis (ICI); the local product is the standard padded
    gather+FMA+reduce.  (The reference delegates the equivalent halo exchange
    to PETSc's MatMult, SURVEY.md §2.5 P8.)
    """

    ax = row_axes(mesh)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ax, None), P(ax, None), P(ax)),
             out_specs=P(ax))
    def f(ci, vp, xl):
        xg = jax.lax.all_gather(xl, ax, tiled=True)          # (n,)
        xe = jnp.concatenate([xg, jnp.zeros(1, xg.dtype)])   # sentinel slot
        return jnp.sum(vp * xe[ci], axis=1)

    return f(colind, vals_pad, x)


def _exchange_ghosts(deltas, send_parts, xl, ax):
    """Per-distance ghost exchange inside shard_map: one ``ppermute`` per
    coupled shard distance ``delta = src − dst``, each of its own width
    T_delta (see partition.build_ghost_plan).  ``xl`` may be (nl,) scalar or
    (nl, bs) block-segment rows; returns the concatenated ghost rows in
    receiver-frame order."""
    nd = jax.lax.axis_size(ax)
    ghosts = []
    for d_i, d in enumerate(deltas):
        si = send_parts[d_i][0]                   # my send row (T_delta,)
        send = xl[si]
        perm = [(s, s - d) for s in range(nd) if 0 <= s - d < nd]
        ghosts.append(jax.lax.ppermute(send, ax, perm))
    return ghosts


def dist_spmv_ghost(mesh: Mesh, ghost_colind: jax.Array,
                    vals_pad: jax.Array, send_parts, deltas,
                    x: jax.Array) -> jax.Array:
    """y = A x exchanging ONLY the needed off-shard x entries.

    The compressed (ghost-index) halo exchange — VecScatter semantics, which
    the reference inherits from PETSc (reference: doc/user-doc.md:36;
    MatMult behind blasted_petsc.cpp:229-298): each device gathers the
    values its neighbours need (``send_parts``, host-precomputed by
    ``partition.build_ghost_plan``), one ``ppermute`` per coupled shard
    distance swaps them, and the local product indexes
    ``[x_local ; ghosts ; 0]`` through the remapped ``ghost_colind``.
    Per-device traffic is Σ_delta T_delta values — the actual ghost count,
    not an all-pairs max (VERDICT r3 #6)."""
    ax = row_axes(mesh)
    specs_sp = tuple(P(ax, None) for _ in send_parts)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ax, None), P(ax, None), specs_sp, P(ax)),
             out_specs=P(ax))
    def f(ci, vp, sps, xl):
        ghosts = _exchange_ghosts(deltas, sps, xl, ax)
        xe = jnp.concatenate([xl, *ghosts, jnp.zeros(1, xl.dtype)])
        return jnp.sum(vp * xe[ci], axis=1)

    return f(ghost_colind, vals_pad, tuple(send_parts), x)


def dist_bspmv_ghost(mesh: Mesh, ghost_colind: jax.Array,
                     vals_pad: jax.Array, send_parts, deltas,
                     x: jax.Array) -> jax.Array:
    """Block analogue of :func:`dist_spmv_ghost`: bs-wide block segments are
    exchanged, the local product is a batched bs×bs matmul on the MXU."""
    ax = row_axes(mesh)
    bs = vals_pad.shape[-1]
    specs_sp = tuple(P(ax, None) for _ in send_parts)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ax, None), P(ax, None, None, None),
                       specs_sp, P(ax)),
             out_specs=P(ax))
    def f(ci, vp, sps, xl):
        xb = xl.reshape(-1, bs)
        ghosts = _exchange_ghosts(deltas, sps, xb, ax)
        xe = jnp.concatenate([xb, *ghosts, jnp.zeros((1, bs), xb.dtype)])
        g = xe[ci]                                       # (nbl, W, bs)
        y = jnp.einsum("rwij,rwj->ri", vp, g,
                       preferred_element_type=vp.dtype)
        return y.reshape(-1)

    return f(ghost_colind, vals_pad, tuple(send_parts), x)


def dist_bspmv(mesh: Mesh, colind: jax.Array, vals_pad: jax.Array,
               x: jax.Array) -> jax.Array:
    """y = A x for block-row-sharded BSR A and flat row-sharded x (the block
    analogue of :func:`dist_spmv`; reference: PETSc MatMult over BAIJ,
    SURVEY.md §2.5 P8).  Off-shard x block-segments are fetched with one
    tiled ``all_gather``; the local product is a batched bs×bs matmul on the
    MXU."""
    ax = row_axes(mesh)
    bs = vals_pad.shape[-1]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ax, None), P(ax, None, None, None), P(ax)),
             out_specs=P(ax))
    def f(ci, vp, xl):
        xg = jax.lax.all_gather(xl, ax, tiled=True)          # (n,)
        xb = xg.reshape(-1, bs)                              # (nbrows, bs)
        xe = jnp.concatenate([xb, jnp.zeros((1, bs), xb.dtype)])
        g = xe[ci]                                           # (nbl, W, bs)
        y = jnp.einsum("rwij,rwj->ri", vp, g,
                       preferred_element_type=vp.dtype)
        return y.reshape(-1)

    return f(colind, vals_pad, x)


class LocalBlockPreconditioner:
    """Shard-local preconditioner with global block-Jacobi semantics.

    Setup builds one scalar preconditioner per shard on its diagonal block
    (host loop — the analogue of each MPI rank building its own BLASTed
    context, blasted_petsc.cpp:216-311) and stacks the apply states on a
    leading shard axis.  ``apply`` runs under ``shard_map`` with **no
    communication**: the defining property of the reference's local
    preconditioner contract.
    """

    def __init__(self, mesh: Mesh, dA, settings: AsyncSolverSettings):
        self.mesh = mesh
        self.dA = dA
        self.settings = settings
        # block size of the local operators (DistBSR carries PaddedBSR locals)
        self.bs = dA.local.vals_pad.shape[-1] \
            if dA.local.vals_pad.ndim > 3 else 1
        # ONE template object from shard 0's slice — O(1) host constructions
        # in nshards (VERDICT r3 #8); per-shard objects exist only on the
        # exact/SEQUENTIAL fallback path (ragged shard schedules)
        local_0 = jax.tree_util.tree_map(lambda a: a[0], dA.local)
        self._template = create_preconditioner(local_0, settings)

    def compute(self):
        res = self._template.shard_setup(self.dA.local, self.dA.nshards)
        self.infos = None
        if res is not NotImplemented:
            setup, self._template = res
            # single-trace setup: ONE vmapped computation over the stacked
            # shard-local matrices — under jit/GSPMD the shard axis is
            # already device-sharded, so every device factorizes its own
            # block concurrently with no per-shard host dispatch
            # (VERDICT r2 #6; reference analogue: concurrent per-rank
            # compute, blasted_petsc.cpp:216-311)
            stacked, infos = jax.vmap(self._template.compute_state_with)(
                self.dA.local, setup)
            if infos is not None and self.settings.compute_precinfo:
                self.infos = infos               # stacked per-shard PrecInfo
        else:
            # exact/SEQUENTIAL paths: ragged per-shard schedules → host loop
            shard_precs = []
            for d in range(self.dA.nshards):
                local_d = jax.tree_util.tree_map(lambda a, d=d: a[d],
                                                 self.dA.local)
                shard_precs.append(create_preconditioner(local_d,
                                                         self.settings))
            states, infolist = [], []
            for p in shard_precs:
                infolist.append(p.compute())
                states.append(p.apply_state())
            self._template = shard_precs[0].patched_for_shards(shard_precs)
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                             *states)
            if self.settings.compute_precinfo:
                self.infos = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *infolist)
        # shard the stacked state pytrees on the mesh
        ax = row_axes(self.mesh)
        self._state = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(self.mesh,
                                 P(*((ax,) + (None,) * (a.ndim - 1))))),
            stacked)
        return self

    def precinfo(self):
        """Per-shard PrecInfo reduced across shards: remainder norms summed,
        average dominance averaged, minimum dominance minimised — the
        analogue of the reference's per-rank PrecInfoList accumulation
        (blasted_petsc.h:56-84, preconditioner_diagnostics.hpp:14-57).
        None unless ``compute_precinfo`` was set."""
        if self.infos is None:
            return None
        from ..precond.base import PrecInfo

        i = self.infos
        return PrecInfo(
            prec_rem_initial_norm=jnp.sum(
                jnp.asarray(i.prec_rem_initial_norm)),
            prec_remainder_norm=jnp.sum(jnp.asarray(i.prec_remainder_norm)),
            lower_avg_diag_dom=jnp.mean(jnp.asarray(i.lower_avg_diag_dom)),
            lower_min_diag_dom=jnp.min(jnp.asarray(i.lower_min_diag_dom)),
            upper_avg_diag_dom=jnp.mean(jnp.asarray(i.upper_avg_diag_dom)),
            upper_min_diag_dom=jnp.min(jnp.asarray(i.upper_min_diag_dom)))

    def apply(self, r: jax.Array) -> jax.Array:
        """r is the row-sharded global residual; returns z, same sharding."""
        mesh = self.mesh
        local = self.dA.local
        state = self._state
        template = self._template

        bs = self.bs

        def local_apply(local_mat_sl, state_sl, rl):
            # device-local slices arrive with a leading length-1 shard axis
            mat = jax.tree_util.tree_map(lambda a: a[0], local_mat_sl)
            st = jax.tree_util.tree_map(lambda a: a[0], state_sl)
            # the shard-state protocol: apply_with is pure in (mat, state, r)
            # (precond/base.py), so tracing once with each device's slice
            # substituted is sound by contract, not by accident
            if bs > 1:   # block operators take (nbrows, bs) segments
                return template.apply_with(mat, st,
                                           rl.reshape(-1, bs)).reshape(-1)
            return template.apply_with(mat, st, rl)

        ax = row_axes(mesh)
        specs_mat = jax.tree_util.tree_map(
            lambda a: P(*((ax,) + (None,) * (a.ndim - 1))), local)
        specs_state = jax.tree_util.tree_map(
            lambda a: P(*((ax,) + (None,) * (a.ndim - 1))), state)

        f = shard_map(local_apply, mesh=mesh,
                      in_specs=(specs_mat, specs_state, P(ax)),
                      out_specs=P(ax))
        return f(local, state, r)


class DistributedSolver:
    """Convenience driver: partition, place, precondition, solve.

    The Krylov algorithms are the *same* jittable drivers as the single-chip
    path (solvers/krylov.py); their dot products become global reductions
    because the vectors are row-sharded global arrays (psum under the hood).
    """

    def __init__(self, A, mesh: Mesh,
                 settings: AsyncSolverSettings | None = None):
        self.mesh = mesh
        nshards = mesh.devices.size
        if isinstance(A, BSRMatrix):
            # the reference's bjacobi-over-BAIJ path (blasted_petsc.cpp
            # :281-298), for unstructured block matrices where the banded
            # DistBlockDiaSolver does not apply
            self.dA = shard_dist_csr(mesh, partition_bsr(A, nshards))
            self.bs = A.bs
        else:
            self.dA = shard_dist_csr(mesh, partition_csr(A, nshards))
            self.bs = 1
        self.settings = settings or AsyncSolverSettings(
            prec_type=PrecType.JACOBI)
        if self.settings.prec_type == PrecType.NONE:
            self.prec = None
        else:
            self.prec = LocalBlockPreconditioner(
                mesh, self.dA, self.settings).compute()

    def amat(self, x: jax.Array) -> jax.Array:
        dA = self.dA
        if dA.ghost_colind is not None:  # compressed ghost exchange (∝ halo)
            if self.bs > 1:
                return dist_bspmv_ghost(self.mesh, dA.ghost_colind,
                                        dA.vals_pad, dA.send_parts,
                                        dA.ghost_deltas, x)
            return dist_spmv_ghost(self.mesh, dA.ghost_colind, dA.vals_pad,
                                   dA.send_parts, dA.ghost_deltas, x)
        if self.bs > 1:                  # dense coupling: all_gather fallback
            return dist_bspmv(self.mesh, dA.colind, dA.vals_pad, x)
        return dist_spmv(self.mesh, dA.colind, dA.vals_pad, x)

    def prec_apply(self, r: jax.Array) -> jax.Array:
        return r if self.prec is None else self.prec.apply(r)

    def precinfo(self):
        return None if self.prec is None else self.prec.precinfo()

    def solve(self, b, x0=None, method: str = "bicgstab", tol: float = 1e-8,
              maxiter: int = 500, **kw):
        from ..solvers import bicgstab, cg, gcr, richardson

        solver = {"bicgstab": bicgstab, "cg": cg, "gcr": gcr,
                  "richardson": richardson}[method]
        # uneven partitions: the system was identity-padded at partition
        # time; zero-padded RHS/guess keep the padded rows exactly zero, so
        # the solve matches the unpadded single-chip oracle on [:n_orig]
        n = self.dA.nrows if self.bs == 1 else self.dA.nbrows * self.bs
        b = shard_vector(self.mesh, _zero_pad(b, n))
        x0 = (shard_vector(self.mesh, _zero_pad(x0, n)) if x0 is not None
              else jnp.zeros_like(b))
        x, info = solver(self.amat, self.prec_apply, b, x0,
                         tol=tol, maxiter=maxiter, **kw)
        n_orig = self.dA.nrows_orig * (1 if self.bs == 1 else self.bs)
        if n_orig and n_orig != n:
            x = x[:n_orig]
        return x, info
