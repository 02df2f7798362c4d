"""Distributed DIA path: banded matrices over a device mesh.

The general distributed path (parallel/dist.py) all-gathers x for the SpMV.
Banded matrices need only a *neighbour halo*: with halo width
H = max|offset| ≤ rows-per-shard, each shard exchanges H boundary entries
with its two ring neighbours via ``lax.ppermute`` over ICI — the TPU-native
equivalent of PETSc's VecScatter halo update (SURVEY.md §2.5 P8), and the
communication pattern behind the ≥80% weak-scaling target (BASELINE.md).

The shard-local preconditioner follows the block-Jacobi contract: the local
diagonal block of a banded matrix is the same band with entries crossing the
shard boundary masked out, so the *entire* setup (ILU fixed-point sweeps) and
apply run inside ``shard_map`` with zero communication — not even a host loop
over shards (the local mask is position-identical on every shard).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ApplyInit, AsyncSolverSettings, FactInit, PrecType
from .dist import row_axes
from ..precond.dia_ilu0 import dia_factor_sweep, dia_pairs
from ..sparse.dia import DiaMatrix, shift_read

__all__ = ["DistDiaSolver", "DistBlockDiaSolver", "dist_dia_spmv"]


def _ring_halo(xl, H, axis):
    """Exchange H-entry boundary strips with ring neighbours; zero at the
    non-periodic ends."""
    nd = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    left = jax.lax.ppermute(xl[-H:], axis, fwd)    # my left halo ← left nbr
    right = jax.lax.ppermute(xl[:H], axis, bwd)    # my right halo ← right nbr
    left = jnp.where(idx == 0, 0.0, left)
    right = jnp.where(idx == nd - 1, 0.0, right)
    return left, right


def dist_dia_spmv(mesh: Mesh, offsets, data, x: jax.Array,
                  halo: int) -> jax.Array:
    """y = A x with row-sharded DIA data (tuple of k (n,) streams) and x (n,).

    Communication/compute overlap (SURVEY.md §7 hard part 4): the halo
    ``ppermute`` is issued first, then the *interior* contribution — local
    zero-padded shifted reads, independent of the halo — so XLA schedules the
    collective-permute asynchronously behind the bulk FMA pass.  Only the
    O(k·H) boundary rows are corrected from the halos afterwards."""

    ax = row_axes(mesh)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ax), P(ax)), out_specs=P(ax))
    def f(dl, xl):
        nl = xl.shape[0]
        left, right = _ring_halo(xl, halo, ax)
        # interior pass: no data dependency on left/right → overlaps comm
        acc = dl[0] * shift_read(xl, offsets[0])
        for d in range(1, len(offsets)):
            acc = acc + dl[d] * shift_read(xl, offsets[d])
        # boundary corrections: |o| rows per diagonal read from the halos
        for d, o in enumerate(offsets):
            if o < 0:
                acc = acc.at[:-o].add(dl[d][:-o] * left[halo + o:])
            elif o > 0:
                acc = acc.at[nl - o:].add(dl[d][nl - o:] * right[:o])
        return acc

    return f(data, x)


class DistDiaSolver:
    """Banded distributed solve: halo SpMV + shard-local DIA preconditioner."""

    def __init__(self, A, mesh: Mesh,
                 settings: AsyncSolverSettings | None = None):
        from ..sparse.csr import CSRMatrix
        from ..sparse.dia import dia_from_csr

        if isinstance(A, CSRMatrix):
            A = dia_from_csr(A)
        if not isinstance(A, DiaMatrix):
            raise TypeError("DistDiaSolver needs a banded (DIA) matrix")
        self.mesh = mesh
        self.offsets = A.offsets
        self.halo = max((abs(o) for o in A.offsets), default=0)
        nd = int(mesh.devices.size)
        self.n_orig = A.nrows
        if A.nrows % nd:        # uneven partition: identity-pad (decoupled
            from ..sparse.dia import dia_pad_identity  # rows stay zero)
            A = dia_pad_identity(A, -(-A.nrows // nd) * nd)
        n = A.nrows
        self.nl = n // nd
        if self.halo > self.nl:
            raise ValueError("band wider than a shard; use the general path")
        self.settings = settings or AsyncSolverSettings(
            prec_type=PrecType.JACOBI)

        self._ax = row_axes(mesh)
        sh1 = NamedSharding(mesh, P(self._ax))
        self.data = jax.device_put(A.data, sh1)   # tuple of (n,) streams
        self.mask = jax.device_put(A.mask, sh1)
        self._prec_state = None
        self._compute()

    # -- preconditioner setup (all inside shard_map) -------------------------

    def _compute(self):
        s = self.settings
        offsets = self.offsets
        mesh = self.mesh
        t = s.prec_type
        if t == PrecType.NONE:
            self._prec_state = None
            return

        d0 = offsets.index(0)
        pairs = dia_pairs(offsets)
        nsweeps = max(s.nbuildsweeps, 1)
        nl = self.nl

        ax = self._ax
        nglobal = nl * int(self.mesh.devices.size)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(ax), P(ax)),
                 out_specs=(P(ax), P(ax), P()))
        def setup(dl, ml):
            # local-block mask: entries crossing the shard boundary drop out
            r = jnp.arange(nl)
            mask_l = tuple(
                ml[d] & ((r + o) >= 0) & ((r + o) < nl)
                for d, o in enumerate(offsets))
            base = tuple(jnp.where(m, v, 0.0) for m, v in zip(mask_l, dl))
            info6 = jnp.zeros(6, base[0].dtype)
            if t in (PrecType.JACOBI, PrecType.GS, PrecType.SGS):
                return base, 1.0 / base[d0], info6
            # fixed-point ILU(0) sweeps on the local band
            if s.fact_init == FactInit.SGS:
                den = jnp.where(base[d0] == 0, 1.0, base[d0])
                ilu0 = tuple(
                    jnp.where(mask_l[d],
                              base[d] / jnp.where(
                                  shift_read(den, o) == 0, 1.0,
                                  shift_read(den, o)), 0.0)
                    if o < 0 else base[d]
                    for d, o in enumerate(offsets))
            else:
                ilu0 = base
            ilu = jax.lax.fori_loop(
                0, nsweeps,
                lambda i, v: dia_factor_sweep(offsets, pairs, d0, mask_l,
                                              base, v),
                ilu0)
            udiag = ilu[d0]
            if s.compute_precinfo:
                # per-shard ILU remainder + L/U diag dominance of the local
                # factors, reduced across shards — the per-rank PrecInfo of
                # the reference (blasted_petsc.h:56-84); remainders sum,
                # averages average (equal shards), minima take pmin
                rem = jnp.zeros((), base[0].dtype)
                for d, o in enumerate(offsets):
                    sv = base[d]
                    for (dl_, du_, o1) in pairs[d]:
                        sv = sv - ilu[dl_] * shift_read(ilu[du_], o1)
                    sv = sv - (ilu[d] * shift_read(udiag, o) if o < 0
                               else ilu[d])
                    rem = rem + jnp.sum(jnp.abs(jnp.where(mask_l[d], sv, 0.0)))
                low = [d for d, o in enumerate(offsets) if o < 0]
                up = [d for d, o in enumerate(offsets) if o > 0]
                lsum = sum((jnp.abs(ilu[d]) for d in low),
                           jnp.zeros(nl, base[0].dtype))
                usum = sum((jnp.abs(ilu[d]) for d in up),
                           jnp.zeros(nl, base[0].dtype))
                ldd = 1.0 - lsum
                udd = 1.0 - usum / jnp.where(udiag == 0, 1.0, jnp.abs(udiag))
                info6 = jnp.stack([
                    jax.lax.psum(rem, ax),
                    jax.lax.psum(jnp.sum(ldd), ax) / nglobal,
                    jax.lax.pmin(jnp.min(ldd), ax),
                    jax.lax.psum(jnp.sum(udd), ax) / nglobal,
                    jax.lax.pmin(jnp.min(udd), ax),
                    jnp.zeros((), base[0].dtype)])
            return ilu, 1.0 / jnp.where(udiag == 0, 1.0, udiag), info6

        vals, dinv, info6 = setup(self.data, self.mask)
        self._prec_state = (vals, dinv)
        self._info6 = info6 if s.compute_precinfo else None

    def precinfo(self):
        """Reduced per-shard PrecInfo (None unless compute_precinfo)."""
        if getattr(self, "_info6", None) is None:
            return None
        from ..precond.base import PrecInfo
        i = self._info6
        return PrecInfo(prec_remainder_norm=i[0],
                        lower_avg_diag_dom=i[1], lower_min_diag_dom=i[2],
                        upper_avg_diag_dom=i[3], upper_min_diag_dom=i[4])

    # -- operators -----------------------------------------------------------

    def amat(self, x: jax.Array) -> jax.Array:
        return dist_dia_spmv(self.mesh, self.offsets, self.data, x, self.halo)

    def prec_apply(self, r: jax.Array) -> jax.Array:
        if self._prec_state is None:
            return r
        s = self.settings
        offsets = self.offsets
        vals, dinv = self._prec_state
        t = s.prec_type
        ns = max(s.napplysweeps, 1)
        lower = [d for d, o in enumerate(offsets) if o < 0]
        upper = [d for d, o in enumerate(offsets) if o > 0]

        ax = self._ax

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(ax), P(ax), P(ax)),
                 out_specs=P(ax))
        def apply_local(vl, di, rl):
            # no communication: shifts read zero beyond the shard (bjacobi)
            def tri_mv(sel, y):
                acc = jnp.zeros_like(y)
                for d in sel:
                    acc = acc + vl[d] * shift_read(y, offsets[d])
                return acc

            if t == PrecType.JACOBI:
                return di * rl
            if t == PrecType.GS:
                x = jnp.zeros_like(rl)
                for _ in range(ns):
                    x = di * (rl - tri_mv(lower, x) - tri_mv(upper, x))
                return x
            if t == PrecType.SGS:
                y = jnp.zeros_like(rl)
                for _ in range(ns):
                    y = di * (rl - tri_mv(lower, y))
                z = jnp.zeros_like(rl)
                for _ in range(ns):
                    z = y - di * tri_mv(upper, z)
                return z
            # ILU0: unit-lower then upper sweeps with the factored band
            y = jnp.zeros_like(rl)
            for _ in range(ns):
                y = rl - tri_mv(lower, y)
            z = y if s.apply_init == ApplyInit.JACOBI else jnp.zeros_like(rl)
            for _ in range(ns):
                z = di * (y - tri_mv(upper, z))
            return z

        return apply_local(vals, dinv, r)

    def solve(self, b, x0=None, method: str = "bicgstab", tol: float = 1e-8,
              maxiter: int = 500, **kw):
        from .dist import shard_vector
        from ..solvers import bicgstab, cg, gcr, gmres, richardson

        solver = {"bicgstab": bicgstab, "cg": cg, "gcr": gcr, "gmres": gmres,
                  "richardson": richardson}[method]
        from .dist import _zero_pad

        n = self.nl * int(self.mesh.devices.size)
        b = shard_vector(self.mesh, _zero_pad(jnp.asarray(b), n))
        x0 = (shard_vector(self.mesh, _zero_pad(jnp.asarray(x0), n))
              if x0 is not None else jnp.zeros_like(b))
        x, info = solver(self.amat, self.prec_apply, b, x0,
                         tol=tol, maxiter=maxiter, **kw)
        if self.n_orig != n:
            x = x[:self.n_orig]
        return x, info


class DistBlockDiaSolver:
    """Block-banded distributed solve: ppermute halo exchange of block
    segments + shard-local block-ILU0/Jacobi/SGS (block analogue of
    :class:`DistDiaSolver`; all block products are MXU-batched matmuls)."""

    def __init__(self, B, mesh: Mesh,
                 settings: AsyncSolverSettings | None = None):
        from ..sparse.bdia import BlockDiaMatrix, bdia_from_bsr
        from ..sparse.bsr import BSRMatrix

        if isinstance(B, BSRMatrix):
            B = bdia_from_bsr(B)
        if not isinstance(B, BlockDiaMatrix):
            raise TypeError("DistBlockDiaSolver needs a block-banded matrix")
        self.mesh = mesh
        self.offsets = B.offsets
        self.bs = B.bs
        self.halo = max((abs(o) for o in B.offsets), default=0)
        nd = int(mesh.devices.size)
        self.nb_orig = B.nbrows
        if B.nbrows % nd:       # uneven partition: identity-pad block rows
            from ..sparse.bdia import bdia_pad_identity
            B = bdia_pad_identity(B, -(-B.nbrows // nd) * nd)
        self.nl = B.nbrows // nd
        if self.halo > self.nl:
            raise ValueError("band wider than a shard; use the general path")
        self.settings = settings or AsyncSolverSettings(
            prec_type=PrecType.JACOBI)
        self._ax = row_axes(mesh)
        # host-resolved BEFORE the masks go to device: inside shard_map the
        # mask is traced, so the stencil-factor route must be decided here
        # (static flag on the container; VERDICT r4 #5)
        self._diag_mask_full = B.resolved_diag_mask_full()
        sh1 = NamedSharding(mesh, P(self._ax))
        self.data = jax.device_put(B.data, sh1)   # SoA component streams
        self.mask = jax.device_put(B.mask, sh1)
        self._compute()

    def _compute(self):
        from ..ops.stencil import _interpret, factor_stencil_eligible
        from ..precond.bdia_ilu0 import (
            _soa_bmm,
            _soa_gj_inverse,
            bdia_factor_sweeps_compressed,
            bdia_factor_sweeps_soa,
        )
        from ..precond.dia_ilu0 import dia_pairs

        s = self.settings
        offsets = self.offsets
        t = s.prec_type
        if t == PrecType.NONE:
            self._prec_state = None
            return
        d0 = offsets.index(0)
        pairs = dia_pairs(offsets)
        nsweeps = max(s.nbuildsweeps, 1)
        nl, bs = self.nl, self.bs
        # Shard-local stencil-factor route: the local d0 mask equals the
        # global one (offset 0 never crosses a shard boundary), so the
        # host-resolved static flag carries into every shard.  Mirrors the
        # local BlockDiaILU0Preconditioner gate (K -> 2K sweep semantics on
        # the compressed path, real TPU only).
        use_stencil = (not _interpret()
                       and factor_stencil_eligible(offsets, pairs)
                       and bool(self._diag_mask_full))

        ax = self._ax
        ngrows = nl * bs * int(self.mesh.devices.size)

        # check_vma=False: the Pallas factor kernel's out_shapes carry no
        # mesh-variance annotation, which the shard_map vma checker rejects
        # on real TPUs (the setup is shard-local except the psum-reduced
        # PrecInfo, whose correctness the tests pin)
        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(ax), P(ax)),
                 out_specs=(P(ax), P(ax), P()), check_vma=False)
        def setup(dl, ml):
            r = jnp.arange(nl)
            mask_l = tuple(
                ml[d] & ((r + o) >= 0) & ((r + o) < nl)
                for d, o in enumerate(offsets))
            base = tuple(tuple(jnp.where(m, c, 0.0) for c in comp)
                         for m, comp in zip(mask_l, dl))
            dt = base[0][0].dtype
            info6 = jnp.zeros(6, dt)
            if t in (PrecType.JACOBI, PrecType.GS, PrecType.SGS):
                dinv = _soa_gj_inverse(base[d0], bs, mask_l[d0])
                return base, dinv, info6
            if use_stencil:
                ilu = bdia_factor_sweeps_compressed(
                    offsets, pairs, d0, mask_l, base, base, nsweeps,
                    diag_mask_full=True)
            else:
                ilu = bdia_factor_sweeps_soa(offsets, pairs, d0, mask_l,
                                             base, base, nsweeps)
            dinv = _soa_gj_inverse(ilu[d0], bs, mask_l[d0])
            if s.compute_precinfo:
                # block remainder + block diag dominance, reduced across
                # shards (cf. the scalar DistDiaSolver and
                # diagnostics.bdia_block_diagonal_dominance)
                udiag = ilu[d0]
                rem = jnp.zeros((), dt)
                for d, o in enumerate(offsets):
                    sv = list(base[d])
                    for (dl_, du_, o1) in pairs[d]:
                        prod = _soa_bmm(ilu[dl_], ilu[du_], bs, shift=o1)
                        sv = [a - p for a, p in zip(sv, prod)]
                    if o < 0:
                        prod = _soa_bmm(ilu[d], udiag, bs, shift=o)
                        sv = [a - p for a, p in zip(sv, prod)]
                    else:
                        sv = [a - c for a, c in zip(sv, ilu[d])]
                    rem = rem + sum(
                        jnp.sum(jnp.abs(jnp.where(mask_l[d], c, 0.0)))
                        for c in sv)
                low = [d for d, o in enumerate(offsets) if o < 0]
                up = [d for d, o in enumerate(offsets) if o > 0]
                zero = jnp.zeros((nl,), dt)
                lsum = [sum((jnp.abs(ilu[d][i * bs + j])
                             for d in low for j in range(bs)), zero)
                        for i in range(bs)]
                usum = [sum((jnp.abs(ilu[d][i * bs + j])
                             for d in up for j in range(bs)), zero)
                        + sum((jnp.abs(udiag[i * bs + j])
                               for j in range(bs) if j != i), zero)
                        for i in range(bs)]
                ddiag = [jnp.abs(udiag[i * bs + i]) for i in range(bs)]
                ldd = jnp.stack([1.0 - sI for sI in lsum], axis=1)
                udd = jnp.stack(
                    [1.0 - u / jnp.where(dI == 0, 1.0, dI)
                     for u, dI in zip(usum, ddiag)], axis=1)
                info6 = jnp.stack([
                    jax.lax.psum(rem, ax),
                    jax.lax.psum(jnp.sum(ldd), ax) / ngrows,
                    jax.lax.pmin(jnp.min(ldd), ax),
                    jax.lax.psum(jnp.sum(udd), ax) / ngrows,
                    jax.lax.pmin(jnp.min(udd), ax),
                    jnp.zeros((), dt)])
            return ilu, dinv, info6

        vals, dinv, info6 = setup(self.data, self.mask)
        self._prec_state = (vals, dinv)
        self._info6 = info6 if s.compute_precinfo else None

    def precinfo(self):
        """Reduced per-shard PrecInfo (None unless compute_precinfo)."""
        if getattr(self, "_info6", None) is None:
            return None
        from ..precond.base import PrecInfo
        i = self._info6
        return PrecInfo(prec_remainder_norm=i[0],
                        lower_avg_diag_dom=i[1], lower_min_diag_dom=i[2],
                        upper_avg_diag_dom=i[3], upper_min_diag_dom=i[4])

    def amat(self, x: jax.Array) -> jax.Array:
        """x is the row-sharded (nbrows, bs) global block vector."""
        offsets, H, bs = self.offsets, self.halo, self.bs
        ax = self._ax

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(ax), P(ax, None)),
                 out_specs=P(ax, None))
        def f(dl, xl):
            # interior SoA products first (independent of the halo), so the
            # collective-permute overlaps the streamed FMAs; then correct
            # the |o| boundary block-rows per diagonal from the halos
            nl = xl.shape[0]
            left, right = _ring_halo(xl, H, ax)
            cols = [xl[:, j] for j in range(bs)]
            lcol = [left[:, j] for j in range(bs)]
            rcol = [right[:, j] for j in range(bs)]
            acc = [None] * bs
            for i in range(bs):
                for d, o in enumerate(offsets):
                    for j in range(bs):
                        tm = dl[d][i * bs + j] * shift_read(cols[j], o)
                        acc[i] = tm if acc[i] is None else acc[i] + tm
            for d, o in enumerate(offsets):
                if o < 0:
                    for i in range(bs):
                        corr = sum(dl[d][i * bs + j][:-o] * lcol[j][H + o:]
                                   for j in range(bs))
                        acc[i] = acc[i].at[:-o].add(corr)
                elif o > 0:
                    for i in range(bs):
                        corr = sum(dl[d][i * bs + j][nl - o:] * rcol[j][:o]
                                   for j in range(bs))
                        acc[i] = acc[i].at[nl - o:].add(corr)
            return jnp.stack(acc, axis=1)

        return f(self.data, x)

    def prec_apply(self, r: jax.Array) -> jax.Array:
        if self._prec_state is None:
            return r
        from ..ops.bdia import soa_dinv_mul, soa_mv_streams

        s = self.settings
        offsets, bs = self.offsets, self.bs
        vals, dinv = self._prec_state
        t = s.prec_type
        ns = max(s.napplysweeps, 1)
        lower = [d for d, o in enumerate(offsets) if o < 0]
        upper = [d for d, o in enumerate(offsets) if o > 0]

        ax = self._ax

        @partial(shard_map, mesh=self.mesh,
                 in_specs=(P(ax), P(ax), P(ax, None)),
                 out_specs=P(ax, None))
        def apply_local(vl, di, rl):
            rc = [rl[:, j] for j in range(bs)]
            zero = [jnp.zeros_like(c) for c in rc]

            def dmul(seg):
                return soa_dinv_mul(di, seg, bs)

            def tri_mv(sel, y):
                return soa_mv_streams(vl, offsets, sel, y, bs)

            if t == PrecType.JACOBI:
                return jnp.stack(dmul(rc), axis=1)
            if t == PrecType.GS:
                x = zero
                for _ in range(ns):
                    lx, ux = tri_mv(lower, x), tri_mv(upper, x)
                    x = dmul([r0 - l - u for r0, l, u in zip(rc, lx, ux)])
                return jnp.stack(x, axis=1)
            if t == PrecType.SGS:
                y = zero
                for _ in range(ns):
                    ly = tri_mv(lower, y)
                    y = dmul([r0 - l for r0, l in zip(rc, ly)])
                z = zero
                for _ in range(ns):
                    uz = dmul(tri_mv(upper, z))
                    z = [yi - u for yi, u in zip(y, uz)]
                return jnp.stack(z, axis=1)
            y = zero
            for _ in range(ns):
                ly = tri_mv(lower, y)
                y = [r0 - l for r0, l in zip(rc, ly)]
            z = y if s.apply_init == ApplyInit.JACOBI else zero
            for _ in range(ns):
                uz = tri_mv(upper, z)
                z = dmul([yi - u for yi, u in zip(y, uz)])
            return jnp.stack(z, axis=1)

        return apply_local(vals, dinv, r)

    def solve(self, b, x0=None, method: str = "bicgstab", tol: float = 1e-8,
              maxiter: int = 500, **kw):
        from .dist import shard_vector
        from ..solvers import bicgstab, cg, gcr, gmres, richardson

        solver = {"bicgstab": bicgstab, "cg": cg, "gcr": gcr, "gmres": gmres,
                  "richardson": richardson}[method]
        from .dist import _zero_pad

        bs = self.bs
        n = self.nl * bs * int(self.mesh.devices.size)
        sh = NamedSharding(self.mesh, P(self._ax, None))
        bseg = jax.device_put(
            _zero_pad(jnp.asarray(np.asarray(b)), n).reshape(-1, bs), sh)
        x0s = (jax.device_put(
                   _zero_pad(jnp.asarray(np.asarray(x0)), n).reshape(-1, bs),
                   sh)
               if x0 is not None else jnp.zeros_like(bseg))

        def amat_flat(x):
            return self.amat(x.reshape(-1, bs)).reshape(-1)

        def prec_flat(r):
            return self.prec_apply(r.reshape(-1, bs)).reshape(-1)

        x, info = solver(amat_flat, prec_flat, bseg.reshape(-1),
                         x0s.reshape(-1), tol=tol, maxiter=maxiter, **kw)
        if self.nb_orig * bs != n:
            x = x[:self.nb_orig * bs]
        return x, info
