"""Fixed-point ("asynchronous") ILU(0) preconditioners, scalar and block.

Equivalent of ``AsyncILU0_SRPreconditioner`` / ``AsyncBlockILU0_SRPreconditioner``
(reference: src/solverops_ilu0.cpp, src/async_ilu_factor.cpp,
src/async_blockilu_factor.cpp, src/kernels/kernels_ilu0_factorize.hpp).

Factorization (Chow–Patel): repeat ``nbuildsweeps`` times the whole-pattern
update
    lower (i>c):  l_ic ← (â_ic − Σ l_ik u_kc) / u_cc
    upper (i<=c): u_ic ←  â_ic − Σ l_ik u_kc
where every right-hand value is read from the *previous* sweep — the
synchronous realisation of the reference's no-partial-store invariant
(kernels_ilu0_factorize.hpp:34-40): a shared entry never holds a partial sum,
here because sweeps are double-buffered by construction.  The pair lists come
from the host-side symbolic pass (ilu_pattern.py) padded into gather tensors;
one sweep is two gathers, an (nnz, P) product-reduction (batched bs×bs matmuls
on the MXU for the block variant) and one divide.

``nbuildsweeps == SEQUENTIAL`` (−1, reference blasted_petsc.cpp:88-133)
selects the *exact* factorization: the same update applied level-by-level in
dependency order (one masked sweep per level), reproducing the sequential
IKJ ILU(0) exactly.  Likewise ``napplysweeps == SEQUENTIAL`` selects exact
level-scheduled triangular solves.  The seq/sf/sap factory variants
(solverfactory.cpp:93-107) are combinations of these two switches.

Optional symmetric scaling Â = S·A·S with S = diag(1/√a_ii)
(reference: async_ilu_factor.cpp:43-45, getScalingVector).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SEQUENTIAL, ApplyInit, FactInit
from ..ops.sweeps import (
    block_unit_lower_sweep,
    block_upper_solve_sweep,
    invert_diag_blocks,
    run_sweeps,
    unit_lower_sweep,
    upper_solve_sweep,
)
from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR, extend_zero
from .base import Preconditioner, PrecInfo
from .ilu_pattern import (
    compute_fact_slots,
    compute_ilu_positions,
    pad_ilu_positions,
    rows_of_nnz,
)
from .levels import (
    compute_levels_lower,
    compute_levels_upper,
    exact_block_lower_solve,
    exact_block_upper_solve,
    exact_lower_solve,
    exact_upper_solve,
)

__all__ = ["ILU0Preconditioner", "BlockILU0Preconditioner"]


class _ILUSymbolic(NamedTuple):
    """Device-resident symbolic data, computed once per sparsity pattern
    (reference caches plist across compute() calls, solverops_ilu0.cpp:193-196)."""

    lowerp: jax.Array      # (nnz, P) int32 pair gather indices, sentinel nnz
    upperp: jax.Array      # (nnz, P)
    colind: jax.Array      # (nnz,) int32 — column of each stored nonzero
    is_lower: jax.Array    # (nnz,) bool  — strictly-lower entries
    fact_level: jax.Array  # (n,) int32 — row wavefront for exact factorization
    low_level: jax.Array   # (n,) int32 — wavefronts for exact L-solve
    up_level: jax.Array    # (n,) int32 — wavefronts for exact U-solve
    nfact: int
    nlow: int
    nup: int
    # Within one factorization wavefront, a row's lower entries form a chain
    # (l_ic reads l_ik, k<c, of the same row); this many masked inner sweeps
    # make the per-level update exact: max lower-entries-per-row + 1.
    fact_inner: int
    # entry-level exact schedule (ilu_pattern.compute_fact_slots): nnz ids
    # sorted by slot + padded segment table; the SEQUENTIAL path scans slots
    # and updates each entry exactly once instead of masked full sweeps
    slot_order: jax.Array   # (nnz + maxseg,) int32, sentinel nnz
    slot_starts: jax.Array  # (nslots,) int32
    slot_lens: jax.Array    # (nslots,) int32
    maxseg: int


class _ILUState(NamedTuple):
    ilu: jax.Array        # (nnz,) or (nnzb, bs, bs) factor values
    ilu_pad: jax.Array    # row-padded factor values for the solves
    ilu_dinv: jax.Array   # 1/u_ii or inv(U_ii)
    scale: jax.Array | None
    low_level: jax.Array  # (n,) wavefronts for the exact apply paths
    up_level: jax.Array   # (n,)


def _build_symbolic(P, chunk_size: int = 0) -> _ILUSymbolic:
    rowptr = np.asarray(P.rowptr)
    n = rowptr.shape[0] - 1
    nnz = int(np.asarray(P.nnz_total))
    # reconstruct flat colind from the padded form
    colind_np = np.zeros(nnz, dtype=np.int32)
    pos = np.asarray(P.pos)
    cols = np.asarray(P.colind)
    valid = pos < nnz
    colind_np[pos[valid]] = cols[valid]
    diagind = np.asarray(P.diagind)

    plist = compute_ilu_positions(rowptr, colind_np, diagind)
    padded = pad_ilu_positions(plist, nnz)
    rows = rows_of_nnz(rowptr)
    is_lower = colind_np < rows

    fact_level = compute_levels_lower(rowptr, colind_np)
    low_level = fact_level  # same dependency pattern (strict lower)
    up_level = compute_levels_upper(rowptr, colind_np)
    rows = rows_of_nnz(rowptr)
    nlower_per_row = np.bincount(rows[is_lower], minlength=n) if nnz else \
        np.zeros(n, dtype=np.int64)
    slots = compute_fact_slots(rowptr, colind_np, fact_level,
                               chunk_size=chunk_size)
    return _ILUSymbolic(
        lowerp=jnp.asarray(padded.lowerp),
        upperp=jnp.asarray(padded.upperp),
        colind=jnp.asarray(colind_np),
        is_lower=jnp.asarray(is_lower),
        fact_level=jnp.asarray(fact_level),
        low_level=jnp.asarray(low_level),
        up_level=jnp.asarray(up_level),
        nfact=int(fact_level.max()) + 1,
        nlow=int(fact_level.max()) + 1,
        nup=int(up_level.max()) + 1,
        fact_inner=int(nlower_per_row.max()) + 1,
        slot_order=jnp.asarray(slots.order),
        slot_starts=jnp.asarray(slots.starts),
        slot_lens=jnp.asarray(slots.lens),
        maxseg=slots.maxseg,
    )


def _segmented_exact_factor(base, ilu, sym: _ILUSymbolic, diagind,
                            block: bool):
    """Exact IKJ ILU(0) by entry-level wavefront slots: one ``lax.scan`` step
    per slot touches only that slot's (padded) entries — Σ_slots pad(|slot|)
    total work vs the masked full-sweep form's nfact × fact_inner × nnz
    (reference sequential run: async_ilu_factor.cpp with 1 thread/sweep).
    Every dependency of a slot's entries is final when the slot runs, so one
    update per entry reproduces the sequential factorization exactly."""
    nnz = base.shape[0]
    pairs = sym.lowerp.shape[1]
    pad = jnp.full((1, pairs), nnz, dtype=sym.lowerp.dtype)
    lowerp = jnp.concatenate([sym.lowerp, pad])
    upperp = jnp.concatenate([sym.upperp, pad])
    base_e = extend_zero(base)
    islow_e = jnp.concatenate(
        [sym.is_lower, jnp.zeros((1,), sym.is_lower.dtype)])
    col_e = jnp.concatenate([sym.colind, jnp.zeros((1,), sym.colind.dtype)])
    ar = jnp.arange(sym.maxseg)

    def body(ilu_e, seg):
        start, ln = seg
        idx = jax.lax.dynamic_slice(sym.slot_order, (start,), (sym.maxseg,))
        idx = jnp.where(ar < ln, idx, nnz)
        lp, up = lowerp[idx], upperp[idx]
        islow = islow_e[idx]
        if block:
            prod = jnp.einsum("spij,spjk->sik", ilu_e[lp], ilu_e[up],
                              preferred_element_type=ilu_e.dtype)
            s = base_e[idx] - prod
            # u_cc is final (diag of row c sits in a strictly earlier slot)
            dinv = invert_diag_blocks(ilu_e[diagind[col_e[idx]]])
            lowered = jnp.einsum("sij,sjk->sik", s, dinv,
                                 preferred_element_type=ilu_e.dtype)
            newv = jnp.where(islow[:, None, None], lowered, s)
        else:
            s = base_e[idx] - jnp.sum(ilu_e[lp] * ilu_e[up], axis=1)
            ud = ilu_e[diagind[col_e[idx]]]
            newv = jnp.where(islow, s / jnp.where(islow, ud, 1.0), s)
        ilu_e = ilu_e.at[idx].set(newv)
        # sentinel lanes all landed on slot nnz; restore its zero
        ilu_e = ilu_e.at[nnz].set(jnp.zeros(ilu_e.shape[1:], ilu_e.dtype))
        return ilu_e, None

    ilu_e, _ = jax.lax.scan(body, extend_zero(ilu),
                            (sym.slot_starts, sym.slot_lens))
    return ilu_e[:nnz]


class _ILUShardSetup(NamedTuple):
    """Per-shard symbolic data padded to uniform shapes and stacked on a
    leading shard axis, so the whole distributed ILU setup runs as ONE
    vmapped computation (no host loop over shards; reference analogue: all
    MPI ranks factorize concurrently, blasted_petsc.cpp:216-311).

    Flat-nnz arrays are padded to the max shard nnz (``nnzE``) with the
    sentinel remapped from each shard's own ``nnz_d`` to ``nnzE``; padded
    entries carry zero values/False flags throughout the pipeline, so they
    stay exactly zero across sweeps."""

    lowerp: jax.Array    # (nnzE, Pmax) int32, sentinel nnzE
    upperp: jax.Array    # (nnzE, Pmax)
    colind: jax.Array    # (nnzE,) int32, 0 at padding
    is_lower: jax.Array  # (nnzE,) bool, False at padding
    rows: jax.Array      # (nnzE,) int32, 0 at padding
    flatpos: jax.Array   # (nl, W) int32, sentinel nnzE
    low_level: jax.Array  # (nl,)
    up_level: jax.Array   # (nl,)


def _build_shard_setup(mats, chunk_size: int = 0):
    """Per-shard symbolic passes over the local matrices, padded to common
    shapes and stacked (host).  Takes the matrix pytrees directly — no
    per-shard preconditioner objects (VERDICT r3 #8).  Returns
    ``(setup, syms)`` so the caller can also patch shard-maxima statics."""
    syms = [_build_symbolic(m, chunk_size=chunk_size) for m in mats]
    nnzE = max(int(s.colind.shape[0]) for s in syms)
    Pmax = max(int(s.lowerp.shape[1]) for s in syms)
    out = {f: [] for f in _ILUShardSetup._fields}
    for m, sym in zip(mats, syms):
        nnz_d = int(sym.colind.shape[0])
        P_d = int(sym.lowerp.shape[1])
        for name in ("lowerp", "upperp"):
            src = np.asarray(getattr(sym, name))
            a = np.full((nnzE, Pmax), nnzE, dtype=np.int32)
            a[:nnz_d, :P_d] = np.where(src == nnz_d, nnzE, src)
            out[name].append(a)
        ci = np.zeros(nnzE, dtype=np.int32)
        ci[:nnz_d] = np.asarray(sym.colind)
        out["colind"].append(ci)
        il = np.zeros(nnzE, dtype=bool)
        il[:nnz_d] = np.asarray(sym.is_lower)
        out["is_lower"].append(il)
        rw = np.zeros(nnzE, dtype=np.int32)
        rw[:nnz_d] = rows_of_nnz(np.asarray(m.rowptr))
        out["rows"].append(rw)
        pos = np.asarray(m.pos)
        out["flatpos"].append(np.where(pos == nnz_d, nnzE, pos)
                              .astype(np.int32))
        out["low_level"].append(np.asarray(sym.low_level))
        out["up_level"].append(np.asarray(sym.up_level))
    return _ILUShardSetup(**{k: jnp.asarray(np.stack(v))
                             for k, v in out.items()}), syms


# ================================================================= scalar ====

class ILU0Preconditioner(Preconditioner):
    """Scalar fixed-point ILU(0) (reference: solverops_ilu0.cpp:218-383)."""

    def __init__(self, mat: PaddedCSR, nbuildsweeps: int = 1,
                 napplysweeps: int = 1, use_scaling: bool = False,
                 fact_init: FactInit = FactInit.ORIGINAL,
                 apply_init: ApplyInit = ApplyInit.ZERO,
                 compute_precinfo: bool = False,
                 thread_chunk_size: int = 0):
        super().__init__(mat)
        self.nbuildsweeps = nbuildsweeps
        self.napplysweeps = napplysweeps
        self.use_scaling = use_scaling
        self.fact_init = fact_init
        self.apply_init = apply_init
        self.compute_precinfo = compute_precinfo
        self.thread_chunk_size = thread_chunk_size
        self.symbolic: _ILUSymbolic | None = None
        self._vals = None  # flat (nnz,) values of the *current* matrix

    # -- setup --------------------------------------------------------------

    def _ensure_symbolic(self):
        """Symbolic data is computed once per sparsity pattern and survives
        :meth:`~.base.Preconditioner.update_values` (reference caches plist
        across compute() calls, solverops_ilu0.cpp:193-196); values are
        re-read from the current matrix on every compute()."""
        if self.symbolic is None:
            self.symbolic = _build_symbolic(
                self.mat, chunk_size=self.thread_chunk_size)
        self._vals = self.mat.flat_vals()

    def _scaled_vals(self, scale):
        sym = self.symbolic
        rows = jnp.asarray(rows_of_nnz(np.asarray(self.mat.rowptr)))
        if scale is None:
            return self._vals
        return scale[rows] * self._vals * scale[sym.colind]

    def _fact_initial(self, base):
        """Initial iterate (reference: async_ilu_factor.cpp:47-60, 109-151;
        INIT_F_ZERO falls through to the original-matrix init)."""
        sym = self.symbolic
        if self.fact_init == FactInit.SGS:
            # L' = L D⁻¹ (+I implied), U' = D+U so L'U' = (D+L)D⁻¹(D+U)
            diag = base[self.mat.diagind]
            ilu0 = jnp.where(sym.is_lower, base / diag[sym.colind], base)
            return ilu0
        return base  # ZERO and ORIGINAL both start from (scaled) A

    def _factor_sweep_fn(self, base):
        sym = self.symbolic
        diagind = self.mat.diagind

        def sweep(ilu):
            ext = extend_zero(ilu)
            s = base - jnp.sum(ext[sym.lowerp] * ext[sym.upperp], axis=1)
            udiag = ilu[diagind]                      # previous sweep's u_cc
            return jnp.where(sym.is_lower, s / udiag[sym.colind], s)

        return sweep

    def compute(self) -> PrecInfo:
        self._ensure_symbolic()
        sym = self.symbolic
        scale = None
        if self.use_scaling:
            scale = 1.0 / jnp.sqrt(self._vals[self.mat.diagind])
        base = self._scaled_vals(scale)

        if self.state is not None and self.fact_init == FactInit.NONE:
            ilu = self.state.ilu                      # warm start from last compute
        else:
            ilu = self._fact_initial(base)

        sweep = self._factor_sweep_fn(base)
        info0 = self._nonlinear_res(base, ilu) if self.compute_precinfo else 0.0

        if self.nbuildsweeps == SEQUENTIAL:
            # exact: entry-level slot schedule, each entry updated once
            ilu = _segmented_exact_factor(base, ilu, sym, self.mat.diagind,
                                          block=False)
        else:
            ilu = run_sweeps(self.nbuildsweeps, sweep, ilu)

        self.state = _ILUState(
            ilu=ilu,
            ilu_pad=self.mat.repad_vals(ilu),
            ilu_dinv=1.0 / ilu[self.mat.diagind],
            scale=scale,
            low_level=sym.low_level,
            up_level=sym.up_level,
        )
        if self.compute_precinfo:
            from .diagnostics import diagonal_dominance
            info1 = self._nonlinear_res(base, ilu)
            ldd_avg, ldd_min, udd_avg, udd_min = diagonal_dominance(
                self.mat, self.state.ilu_pad)
            return PrecInfo(prec_rem_initial_norm=info0,
                            prec_remainder_norm=info1,
                            lower_avg_diag_dom=ldd_avg,
                            lower_min_diag_dom=ldd_min,
                            upper_avg_diag_dom=udd_avg,
                            upper_min_diag_dom=udd_min)
        return PrecInfo()

    def _nonlinear_res(self, base, ilu):
        """Σ|â_j − Σ_k l·u − (l_j·u_cc | u_j)| — the ILU fixed-point remainder
        (reference: async_ilu_factor.cpp scalar_ilu0_nonlinear_res, :179-217)."""
        sym = self.symbolic
        ext = extend_zero(ilu)
        s = base - jnp.sum(ext[sym.lowerp] * ext[sym.upperp], axis=1)
        udiag = ilu[self.mat.diagind]
        s = s - jnp.where(sym.is_lower, ilu * udiag[sym.colind], ilu)
        return jnp.sum(jnp.abs(s))

    # -- apply --------------------------------------------------------------

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        """Solve LU z ≈ r by sweep (or exact wavefront) triangular solves
        (reference: scalar_ilu0_apply, solverops_ilu0.cpp:240-321)."""
        st, sym = state, self.symbolic
        A = mat
        z = st.scale * r if st.scale is not None else r

        if self.napplysweeps == SEQUENTIAL:
            y = exact_lower_solve(A, st.ilu_pad, z, st.low_level, sym.nlow)
            zout = exact_upper_solve(A, st.ilu_pad, st.ilu_dinv, y,
                                     st.up_level, sym.nup)
        else:
            y0 = jnp.zeros_like(z)
            y = run_sweeps(self.napplysweeps,
                           lambda y: unit_lower_sweep(A, st.ilu_pad, z, y), y0)
            z0 = y if self.apply_init == ApplyInit.JACOBI else jnp.zeros_like(z)
            zout = run_sweeps(self.napplysweeps,
                              lambda zz: upper_solve_sweep(A, st.ilu_pad,
                                                           st.ilu_dinv, y, zz), z0)

        return st.scale * zout if st.scale is not None else zout

    def apply_state(self):
        # the flat (nnz,) factor array varies in size across shards and is
        # not read by apply(); drop it for stacking
        return self.state._replace(ilu=jnp.zeros((0,), self.state.ilu.dtype))

    def shard_setup(self, local, nshards: int):
        if self.nbuildsweeps == SEQUENTIAL:
            # the entry-level slot schedules are ragged per shard; the exact
            # factorization stays on the per-shard host loop
            return NotImplemented
        import copy

        mats = [jax.tree_util.tree_map(lambda a, d=d: a[d], local)
                for d in range(nshards)]
        su, syms = _build_shard_setup(mats, self.thread_chunk_size)
        q = copy.copy(self)
        # wavefront trip counts widen to the shard maxima (extra levels no-op)
        q.symbolic = syms[0]._replace(nlow=max(s.nlow for s in syms),
                                      nup=max(s.nup for s in syms))
        return su, q

    def compute_state_with(self, mat, su: _ILUShardSetup):
        """Pure sweep-ILU(0) setup from (local matrix, padded symbolic) —
        vmapped over shards by the distributed setup (see _ILUShardSetup)."""
        nnzE = su.colind.shape[0]
        dt = mat.vals_pad.dtype
        vals = jnp.zeros((nnzE + 1,), dt).at[su.flatpos.reshape(-1)].set(
            mat.vals_pad.reshape(-1))[:nnzE]
        scale = None
        if self.use_scaling:
            scale = 1.0 / jnp.sqrt(vals[mat.diagind])
            base = scale[su.rows] * vals * scale[su.colind]
        else:
            base = vals
        if self.fact_init == FactInit.SGS:
            diag = base[mat.diagind]
            ilu = jnp.where(su.is_lower, base / diag[su.colind], base)
        else:
            ilu = base

        def sweep(v):
            ext = extend_zero(v)
            s = base - jnp.sum(ext[su.lowerp] * ext[su.upperp], axis=1)
            udiag = v[mat.diagind]
            return jnp.where(su.is_lower, s / udiag[su.colind], s)

        ilu = run_sweeps(self.nbuildsweeps, sweep, ilu)
        ilu_pad = extend_zero(ilu)[su.flatpos]
        state = _ILUState(
            ilu=jnp.zeros((0,), dt),          # == apply_state() form
            ilu_pad=ilu_pad,
            ilu_dinv=1.0 / ilu[mat.diagind],
            scale=scale,
            low_level=su.low_level,
            up_level=su.up_level,
        )
        info = None
        if self.compute_precinfo:
            from .diagnostics import diagonal_dominance
            ext = extend_zero(ilu)
            s = base - jnp.sum(ext[su.lowerp] * ext[su.upperp], axis=1)
            udiag = ilu[mat.diagind]
            s = s - jnp.where(su.is_lower, ilu * udiag[su.colind], ilu)
            ldd_avg, ldd_min, udd_avg, udd_min = diagonal_dominance(
                mat, ilu_pad)
            info = PrecInfo(prec_remainder_norm=jnp.sum(jnp.abs(s)),
                            lower_avg_diag_dom=ldd_avg,
                            lower_min_diag_dom=ldd_min,
                            upper_avg_diag_dom=udd_avg,
                            upper_min_diag_dom=udd_min)
        return state, info

    def patched_for_shards(self, precs):
        # wavefront trip counts become the max over shards (extra levels no-op)
        import copy
        q = copy.copy(self)
        q.symbolic = self.symbolic._replace(
            nlow=max(p.symbolic.nlow for p in precs),
            nup=max(p.symbolic.nup for p in precs))
        return q

    def apply_relax(self, b, x):
        raise NotImplementedError("ILU relaxation not implemented "
                                  "(matches reference, solverops_ilu0.cpp:378-383)")


# ================================================================== block ====

class BlockILU0Preconditioner(Preconditioner):
    """Block fixed-point ILU(0) (reference: solverops_ilu0.cpp:19-216,
    async_blockilu_factor.cpp).  Lower update right-multiplies by the inverse
    of the previous sweep's diagonal block (kernels_ilu0_factorize.hpp:86-96);
    diagonal blocks are pre-inverted for the apply
    (async_blockilu_factor.cpp:143-147)."""

    def __init__(self, mat: PaddedBSR, nbuildsweeps: int = 1,
                 napplysweeps: int = 1, use_scaling: bool = False,
                 fact_init: FactInit = FactInit.ORIGINAL,
                 apply_init: ApplyInit = ApplyInit.ZERO,
                 compute_precinfo: bool = False,
                 thread_chunk_size: int = 0):
        super().__init__(mat)
        self.nbuildsweeps = nbuildsweeps
        self.napplysweeps = napplysweeps
        self.use_scaling = use_scaling
        self.fact_init = fact_init
        self.apply_init = apply_init
        self.compute_precinfo = compute_precinfo
        self.thread_chunk_size = thread_chunk_size
        self.symbolic: _ILUSymbolic | None = None
        self._vals = None  # (nnzb, bs, bs) values of the *current* matrix

    def _ensure_symbolic(self):
        """See :meth:`ILU0Preconditioner._ensure_symbolic`."""
        if self.symbolic is None:
            self.symbolic = _build_symbolic(
                self.mat, chunk_size=self.thread_chunk_size)
        self._vals = self.mat.flat_vals()

    def _scaled_vals(self, scale):
        """scaleBlock: val[i,j] *= s[row·bs+i]·s[col·bs+j]
        (reference: kernels_ilu0_factorize.hpp:61-69); scale is (nbrows, bs)."""
        if scale is None:
            return self._vals
        sym = self.symbolic
        rows = jnp.asarray(rows_of_nnz(np.asarray(self.mat.rowptr)))
        srow = scale[rows]            # (nnzb, bs)
        scol = scale[sym.colind]      # (nnzb, bs)
        return self._vals * srow[:, :, None] * scol[:, None, :]

    def _fact_initial(self, base):
        sym = self.symbolic
        if self.fact_init == FactInit.SGS:
            dinv = invert_diag_blocks(base[self.mat.diagind])
            lowered = jnp.einsum("nij,njk->nik", base, dinv[sym.colind],
                                 preferred_element_type=base.dtype)
            return jnp.where(sym.is_lower[:, None, None], lowered, base)
        return base

    def _factor_sweep_fn(self, base):
        sym = self.symbolic
        diagind = self.mat.diagind

        def sweep(ilu):
            ext = extend_zero(ilu)
            prod = jnp.einsum("npij,npjk->nik", ext[sym.lowerp], ext[sym.upperp],
                              preferred_element_type=ilu.dtype)
            s = base - prod
            dinv = invert_diag_blocks(ilu[diagind])
            lowered = jnp.einsum("nij,njk->nik", s, dinv[sym.colind],
                                 preferred_element_type=ilu.dtype)
            return jnp.where(sym.is_lower[:, None, None], lowered, s)

        return sweep

    def compute(self) -> PrecInfo:
        self._ensure_symbolic()
        sym = self.symbolic
        scale = None
        if self.use_scaling:
            dblocks = self._vals[self.mat.diagind]
            diag = jnp.diagonal(dblocks, axis1=-2, axis2=-1)  # (nbrows, bs)
            scale = 1.0 / jnp.sqrt(diag)
        base = self._scaled_vals(scale)

        if self.state is not None and self.fact_init == FactInit.NONE:
            ilu = self.state.ilu
        else:
            ilu = self._fact_initial(base)

        sweep = self._factor_sweep_fn(base)
        info0 = self._nonlinear_res(base, ilu) if self.compute_precinfo else 0.0
        if self.nbuildsweeps == SEQUENTIAL:
            ilu = _segmented_exact_factor(base, ilu, sym, self.mat.diagind,
                                          block=True)
        else:
            ilu = run_sweeps(self.nbuildsweeps, sweep, ilu)

        self.state = _ILUState(
            ilu=ilu,
            ilu_pad=self.mat.repad_vals(ilu),
            ilu_dinv=invert_diag_blocks(ilu[self.mat.diagind]),
            scale=scale,
            low_level=sym.low_level,
            up_level=sym.up_level,
        )
        if self.compute_precinfo:
            from .diagnostics import block_diagonal_dominance
            info1 = self._nonlinear_res(base, ilu)
            ldd_avg, ldd_min, udd_avg, udd_min = block_diagonal_dominance(
                self.mat, self.state.ilu_pad)
            return PrecInfo(prec_rem_initial_norm=info0,
                            prec_remainder_norm=info1,
                            lower_avg_diag_dom=ldd_avg,
                            lower_min_diag_dom=ldd_min,
                            upper_avg_diag_dom=udd_avg,
                            upper_min_diag_dom=udd_min)
        return PrecInfo()

    def _nonlinear_res(self, base, ilu):
        """Block ILU fixed-point remainder Σ‖Â_j − Σ_k L·U − (l_j·u_cc | u_j)‖₁
        (reference: block_ilu0_nonlinear_res, async_blockilu_factor.cpp:97-141,
        declared async_blockilu_factor.hpp:52)."""
        sym = self.symbolic
        ext = extend_zero(ilu)
        prod = jnp.einsum("npij,npjk->nik", ext[sym.lowerp], ext[sym.upperp],
                          preferred_element_type=ilu.dtype)
        s = base - prod
        udiag = ilu[self.mat.diagind]
        lu = jnp.einsum("nij,njk->nik", ilu, udiag[sym.colind],
                        preferred_element_type=ilu.dtype)
        s = s - jnp.where(sym.is_lower[:, None, None], lu, ilu)
        return jnp.sum(jnp.abs(s))

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        """r, z are (nbrows, bs) block segments
        (reference: block_ilu0_apply, solverops_ilu0.cpp:55-148)."""
        st, sym = state, self.symbolic
        A = mat
        z = st.scale * r if st.scale is not None else r

        if self.napplysweeps == SEQUENTIAL:
            y = exact_block_lower_solve(A, st.ilu_pad, z, st.low_level, sym.nlow)
            zout = exact_block_upper_solve(A, st.ilu_pad, st.ilu_dinv, y,
                                           st.up_level, sym.nup)
        else:
            y0 = jnp.zeros_like(z)
            y = run_sweeps(self.napplysweeps,
                           lambda y: block_unit_lower_sweep(A, st.ilu_pad, z, y),
                           y0)
            z0 = y if self.apply_init == ApplyInit.JACOBI else jnp.zeros_like(z)
            zout = run_sweeps(self.napplysweeps,
                              lambda zz: block_upper_solve_sweep(
                                  A, st.ilu_pad, st.ilu_dinv, y, zz), z0)

        return st.scale * zout if st.scale is not None else zout

    def apply_state(self):
        bs = self.mat.bs
        return self.state._replace(
            ilu=jnp.zeros((0, bs, bs), self.state.ilu.dtype))

    def shard_setup(self, local, nshards: int):
        if self.nbuildsweeps == SEQUENTIAL:
            return NotImplemented
        import copy

        mats = [jax.tree_util.tree_map(lambda a, d=d: a[d], local)
                for d in range(nshards)]
        su, syms = _build_shard_setup(mats, self.thread_chunk_size)
        q = copy.copy(self)
        q.symbolic = syms[0]._replace(nlow=max(s.nlow for s in syms),
                                      nup=max(s.nup for s in syms))
        return su, q

    def compute_state_with(self, mat, su: _ILUShardSetup):
        """Block analogue of :meth:`ILU0Preconditioner.compute_state_with`."""
        nnzE = su.colind.shape[0]
        bs = mat.bs
        dt = mat.vals_pad.dtype
        vals = jnp.zeros((nnzE + 1, bs, bs), dt).at[
            su.flatpos.reshape(-1)].set(
            mat.vals_pad.reshape(-1, bs, bs))[:nnzE]
        scale = None
        if self.use_scaling:
            diag = jnp.diagonal(vals[mat.diagind], axis1=-2, axis2=-1)
            scale = 1.0 / jnp.sqrt(diag)                      # (nl, bs)
            base = vals * scale[su.rows][:, :, None] \
                * scale[su.colind][:, None, :]
        else:
            base = vals
        if self.fact_init == FactInit.SGS:
            dinv = invert_diag_blocks(base[mat.diagind])
            lowered = jnp.einsum("nij,njk->nik", base, dinv[su.colind],
                                 preferred_element_type=dt)
            ilu = jnp.where(su.is_lower[:, None, None], lowered, base)
        else:
            ilu = base

        def sweep(v):
            ext = extend_zero(v)
            prod = jnp.einsum("npij,npjk->nik", ext[su.lowerp],
                              ext[su.upperp], preferred_element_type=dt)
            s = base - prod
            dinv = invert_diag_blocks(v[mat.diagind])
            lowered = jnp.einsum("nij,njk->nik", s, dinv[su.colind],
                                 preferred_element_type=dt)
            return jnp.where(su.is_lower[:, None, None], lowered, s)

        ilu = run_sweeps(self.nbuildsweeps, sweep, ilu)
        ilu_pad = extend_zero(ilu)[su.flatpos]
        state = _ILUState(
            ilu=jnp.zeros((0, bs, bs), dt),
            ilu_pad=ilu_pad,
            ilu_dinv=invert_diag_blocks(ilu[mat.diagind]),
            scale=scale,
            low_level=su.low_level,
            up_level=su.up_level,
        )
        info = None
        if self.compute_precinfo:
            from .diagnostics import block_diagonal_dominance
            ext = extend_zero(ilu)
            prod = jnp.einsum("npij,npjk->nik", ext[su.lowerp],
                              ext[su.upperp], preferred_element_type=dt)
            s = base - prod
            udiag = ilu[mat.diagind]
            lu = jnp.einsum("nij,njk->nik", ilu, udiag[su.colind],
                            preferred_element_type=dt)
            s = s - jnp.where(su.is_lower[:, None, None], lu, ilu)
            ldd_avg, ldd_min, udd_avg, udd_min = block_diagonal_dominance(
                mat, ilu_pad)
            info = PrecInfo(prec_remainder_norm=jnp.sum(jnp.abs(s)),
                            lower_avg_diag_dom=ldd_avg,
                            lower_min_diag_dom=ldd_min,
                            upper_avg_diag_dom=udd_avg,
                            upper_min_diag_dom=udd_min)
        return state, info

    def patched_for_shards(self, precs):
        import copy
        q = copy.copy(self)
        q.symbolic = self.symbolic._replace(
            nlow=max(p.symbolic.nlow for p in precs),
            nup=max(p.symbolic.nup for p in precs))
        return q

    def apply_relax(self, b, x):
        raise NotImplementedError("ILU relaxation not implemented "
                                  "(matches reference)")
