"""Fixed-point ILU(0) on DIA (diagonal) storage — gather-free.

Same mathematics as precond/ilu0.py (the Chow–Patel fixed point of
kernels_ilu0_factorize.hpp, see that module's docstring), specialised to
banded matrices: the symbolic pair lists collapse to a *static* list of
diagonal pairs per target diagonal,

    pairs(o) = {(o1, o2) : o1 < 0, o2 = o − o1 > 0, both stored},

because l_ik lies on diagonal o1 = k−i and u_kc on o2 = c−k = o − o1.  One
factorization sweep is then, per diagonal o,

    ilu_o[i] ← â_o[i] − Σ_{(o1,o2)} ilu_o1[i] · ilu_o2[i+o1]
    ilu_o[i] ← ilu_o[i] / ilu_0[i+o]           (lower diagonals, o<0)
    ilu_o[i] ← 0 outside the structural mask   (pattern parity with CSR)

— purely shifted elementwise arithmetic, no gathers or scatters anywhere in
factorization or application.  The structural mask keeps band-fill positions
out of the pattern so the result is bit-identical (in exact arithmetic) to
the CSR-pattern ILU(0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SEQUENTIAL, ApplyInit, FactInit
from ..ops.sweeps import run_sweeps, unit_lower_sweep, upper_solve_sweep
from ..sparse.dia import DiaMatrix, shift_read
from .base import Preconditioner, PrecInfo
from .ilu0 import _ILUState  # noqa: F401  (shared state shape family)
from .levels import (
    compute_levels_lower,
    compute_levels_upper,
    exact_lower_solve,
    exact_upper_solve,
)

__all__ = ["DiaILU0Preconditioner", "dia_pairs", "dia_factor_sweep"]


def dia_pairs(offsets):
    """Static diagonal-pair lists per target diagonal:
    pairs(o) = {(d_lower, d_upper, o1) : o1<0, o2=o−o1>0, both stored}."""
    oset = {o: d for d, o in enumerate(offsets)}
    return [
        [(oset[o1], oset[o - o1], o1)
         for o1 in offsets if o1 < 0 and (o - o1) in oset and (o - o1) > 0]
        for o in offsets
    ]


def dia_factor_sweep(offsets, pairs, d0, mask, base, ilu):
    """One Chow–Patel fixed-point sweep on DIA storage (pure function;
    shared by the local and the shard-mapped distributed paths).  All
    diagonal-indexed operands (``mask``, ``base``, ``ilu``) are tuples of
    (n,) streams; returns the same."""
    udiag = ilu[d0]
    rows = []
    for d, o in enumerate(offsets):
        s = base[d]
        for (dl, du, o1) in pairs[d]:
            s = s - ilu[dl] * shift_read(ilu[du], o1)
        if o < 0:
            den = shift_read(udiag, o)
            s = s / jnp.where(den == 0, 1.0, den)
        rows.append(jnp.where(mask[d], s, 0.0))
    return tuple(rows)


def dia_factor_sweep_tuple(offsets, pairs, d0, mask_t, base_t, ilu_t):
    """Dependency-pruned sweep over a *tuple* of per-diagonal arrays.

    Upper diagonals with no fill pairs satisfy u_o = â_o at every sweep, so
    (with any base-derived initial iterate) they are fixed points and pass
    through untouched — zero HBM traffic.  For the 7-point stencil this cuts
    the evolving state to the main diagonal plus the lower divisions, nearly
    halving the sweep's memory traffic vs the stacked form.

    ``mask_t[d]`` may be ``None`` when re-masking is provably unnecessary:
    the diagonal's mask is all-True, or o<0 with a pre-masked base (0 / den
    with the guarded denominator stays 0).
    """
    udiag = ilu_t[d0]
    out = []
    for d, o in enumerate(offsets):
        if not pairs[d] and o > 0:
            out.append(ilu_t[d])
            continue
        s = base_t[d]
        for (dl, du, o1) in pairs[d]:
            s = s - ilu_t[dl] * shift_read(ilu_t[du], o1)
        if o < 0:
            den = shift_read(udiag, o)
            s = s / jnp.where(den == 0, 1.0, den)
        out.append(s if mask_t[d] is None else jnp.where(mask_t[d], s, 0.0))
    return tuple(out)


class _DiaILUState(NamedTuple):
    ilu: tuple           # k × (n,) factor values in DIA tuple layout
    ilu_dinv: jax.Array  # (n,) 1/u_ii (guarded)
    scale: jax.Array | None
    low_level: jax.Array
    up_level: jax.Array


class DiaILU0Preconditioner(Preconditioner):
    """Scalar fixed-point ILU(0) on DIA storage (banded fast path)."""

    def __init__(self, mat: DiaMatrix, nbuildsweeps: int = 1,
                 napplysweeps: int = 1, use_scaling: bool = False,
                 fact_init: FactInit = FactInit.ORIGINAL,
                 apply_init: ApplyInit = ApplyInit.ZERO,
                 apply_dtype=None, compute_precinfo: bool = False):
        super().__init__(mat)
        self.nbuildsweeps = nbuildsweeps
        self.napplysweeps = napplysweeps
        self.use_scaling = use_scaling
        self.fact_init = fact_init
        self.apply_init = apply_init
        self.compute_precinfo = compute_precinfo
        # Mixed-precision apply (TPU-first): factor in full precision, store
        # the factors for the triangular sweeps in a narrower dtype (e.g.
        # jnp.bfloat16).  Preconditioner accuracy tolerates this; the Krylov
        # operator and vectors stay full precision.
        self.apply_dtype = apply_dtype
        offs = mat.offsets
        self._d0 = offs.index(0)
        self._pairs = dia_pairs(offs)
        self._levels = None

    # -- helpers ------------------------------------------------------------

    def _build_levels(self):
        if self._levels is None:
            sp = self.mat.to_scipy()
            low = compute_levels_lower(sp.indptr, sp.indices)
            up = compute_levels_upper(sp.indptr, sp.indices)
            nlow_inner = sum(1 for o in self.mat.offsets if o < 0) + 1
            self._levels = (jnp.asarray(low), int(low.max()) + 1,
                            jnp.asarray(up), int(up.max()) + 1, nlow_inner)
        return self._levels

    def _scaled_base(self, scale):
        A = self.mat
        if scale is None:
            return A.data
        return tuple(A.data[d] * scale * shift_read(scale, o)
                     for d, o in enumerate(A.offsets))

    def _fact_initial(self, base):
        A = self.mat
        if self.fact_init == FactInit.SGS:
            d0 = base[self._d0]
            rows = []
            for d, o in enumerate(A.offsets):
                if o < 0:
                    den = shift_read(d0, o)
                    rows.append(jnp.where(A.mask[d],
                                          base[d] / jnp.where(den == 0, 1.0, den),
                                          0.0))
                else:
                    rows.append(base[d])
            return tuple(rows)
        return base

    def _factor_sweep_fn(self, base):
        A = self.mat
        pairs = self._pairs
        d0 = self._d0

        def sweep(ilu):
            return dia_factor_sweep(A.offsets, pairs, d0, A.mask, base, ilu)

        return sweep

    # -- compute / apply ----------------------------------------------------

    def compute(self) -> PrecInfo:
        A = self.mat
        low, nlow, up, nup, fact_inner = self._build_levels()
        scale = None
        if self.use_scaling:
            scale = 1.0 / jnp.sqrt(A.diag_vals)
        base = self._scaled_base(scale)

        if self.state is not None and self.fact_init == FactInit.NONE:
            ilu = self.state.ilu
        else:
            ilu = self._fact_initial(base)

        # tuple-of-diagonals carry: pair-free upper diagonals pass through
        # with zero traffic (see dia_factor_sweep_tuple)
        offsets, pairs, d0 = A.offsets, self._pairs, self._d0
        base_t = base
        mask_t = tuple(
            None if (o < 0 or bool(np.asarray(A.mask[d]).all())) else A.mask[d]
            for d, o in enumerate(offsets))
        ilu_t = ilu

        def sweep_t(v):
            return dia_factor_sweep_tuple(offsets, pairs, d0, mask_t,
                                          base_t, v)

        info0 = self._nonlinear_res(base, ilu) if self.compute_precinfo else 0.0
        from ..ops.stencil import (
            dia_factor_sweeps_stencil,
            factor_stencil_eligible,
            stencil_gate,
        )

        gate = stencil_gate(offsets, A.nrows,
                            jnp.dtype(A.dtype).itemsize,
                            extra_streams=6)
        if (self.nbuildsweeps != SEQUENTIAL and gate is not None
                and factor_stencil_eligible(offsets, pairs)
                and mask_t[d0] is None
                and self.fact_init != FactInit.NONE):
            # large-halo band on a real TPU: the fused Pallas factor sweep
            # (padded-frame chaining; ops/stencil.py).  NOTE the compressed
            # sweep carries TWO plain sweeps' contraction per configured
            # sweep (K -> 2K semantics, test_stencil.py) and seeds its
            # lower chain from the base values only, so FactInit.NONE warm
            # starts (value updates re-using the previous factors) keep the
            # plain per-sweep path — mirroring the block gate below.
            ilu_t = dia_factor_sweeps_stencil(
                offsets, pairs, d0, base_t, ilu_t, self.nbuildsweeps,
                gate[0])
        elif self.nbuildsweeps == SEQUENTIAL:
            lev = low  # factorization wavefronts == lower-solve wavefronts

            def body(it, xt):
                l = it // fact_inner
                xn = sweep_t(xt)
                return tuple(jnp.where(lev == l, a, b)
                             for a, b in zip(xn, xt))

            ilu_t = jax.lax.fori_loop(0, nlow * fact_inner, body, ilu_t)
        else:
            ilu_t = run_sweeps(self.nbuildsweeps, sweep_t, ilu_t)
        ilu = ilu_t

        udiag = ilu[self._d0]
        ilu_store = ilu if self.apply_dtype is None \
            else tuple(v.astype(self.apply_dtype) for v in ilu)
        self.state = _DiaILUState(
            ilu=ilu_store,
            ilu_dinv=1.0 / udiag,
            scale=scale,
            low_level=low,
            up_level=up,
        )
        if self.compute_precinfo:
            from .diagnostics import diagonal_dominance
            info1 = self._nonlinear_res(base, ilu)
            ldd_avg, ldd_min, udd_avg, udd_min = diagonal_dominance(A, ilu)
            return PrecInfo(prec_rem_initial_norm=info0,
                            prec_remainder_norm=info1,
                            lower_avg_diag_dom=ldd_avg,
                            lower_min_diag_dom=ldd_min,
                            upper_avg_diag_dom=udd_avg,
                            upper_min_diag_dom=udd_min)
        return PrecInfo()

    def _nonlinear_res(self, base, ilu):
        """ILU fixed-point remainder Σ|â − Σ l·u − (l·u_cc | u)| on DIA
        storage (reference: scalar_ilu0_nonlinear_res,
        async_ilu_factor.cpp:179-217), per diagonal with shifted reads."""
        A = self.mat
        udiag = ilu[self._d0]
        total = jnp.zeros((), base[0].dtype)
        for d, o in enumerate(A.offsets):
            s = base[d]
            for (dl, du, o1) in self._pairs[d]:
                s = s - ilu[dl] * shift_read(ilu[du], o1)
            if o < 0:
                s = s - ilu[d] * shift_read(udiag, o)
            else:
                s = s - ilu[d]
            total = total + jnp.sum(jnp.abs(jnp.where(A.mask[d], s, 0.0)))
        return total

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        st = state
        A = mat
        _, nlow, _, nup, _ = self._build_levels()
        z = st.scale * r if st.scale is not None else r

        from ..ops.stencil import (
            pad_vec,
            stencil_gate,
            unit_lower_sweep_stencil,
            unpad_vec,
            upper_solve_sweep_stencil,
        )

        gate = (None if self.napplysweeps == SEQUENTIAL else
                stencil_gate(A.offsets, A.nrows,
                             jnp.dtype(z.dtype).itemsize))
        if self.napplysweeps == SEQUENTIAL:
            y = exact_lower_solve(A, st.ilu, z, st.low_level, nlow)
            zout = exact_upper_solve(A, st.ilu, st.ilu_dinv, y,
                                     st.up_level, nup)
        elif gate is not None and st.ilu[0].dtype == z.dtype:
            # Pallas halo-ring sweeps chained in the padded frame
            T = gate[0]
            offs = A.offsets
            yp = run_sweeps(
                self.napplysweeps,
                lambda yy: unit_lower_sweep_stencil(offs, st.ilu, z, yy, T),
                pad_vec(jnp.zeros_like(z), T))
            z0p = yp if self.apply_init == ApplyInit.JACOBI \
                else pad_vec(jnp.zeros_like(z), T)
            zp = run_sweeps(
                self.napplysweeps,
                lambda zz: upper_solve_sweep_stencil(
                    offs, st.ilu, st.ilu_dinv, yp, zz, T, rhs_padded=True),
                z0p)
            zout = unpad_vec(zp, T)
        else:
            y0 = jnp.zeros_like(z)
            y = run_sweeps(self.napplysweeps,
                           lambda y: unit_lower_sweep(A, st.ilu, z, y), y0)
            z0 = y if self.apply_init == ApplyInit.JACOBI else jnp.zeros_like(z)
            zout = run_sweeps(self.napplysweeps,
                              lambda zz: upper_solve_sweep(A, st.ilu,
                                                           st.ilu_dinv, y, zz),
                              z0)

        return st.scale * zout if st.scale is not None else zout

    def patched_for_shards(self, precs):
        import copy
        q = copy.copy(self)
        shards = [p._build_levels() for p in precs]
        me = self._build_levels()
        q._levels = (me[0], max(s[1] for s in shards),
                     me[2], max(s[3] for s in shards), me[4])
        return q

    def apply_relax(self, b, x):
        raise NotImplementedError("ILU relaxation not implemented "
                                  "(matches reference)")
