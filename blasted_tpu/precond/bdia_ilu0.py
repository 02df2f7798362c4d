"""Fixed-point block-ILU(0) on block-DIA storage — gather-free, MXU-batched.

Block analogue of precond/dia_ilu0.py (same diagonal-pair structure) with the
block algebra of the reference's point-block kernels
(reference: kernels_ilu0_factorize.hpp:71-98 async_block_ilu0_factorize,
async_blockilu_factor.cpp): one factorization sweep is, per block diagonal o,

    S_o[i]  = Â_o[i] − Σ_{(o1,o2)} ilu_o1[i] · ilu_o2[i+o1]     (bs×bs matmuls)
    ilu_o[i] = S_o[i] · (ilu_0[i+o])⁻¹                           (o < 0)

with the previous sweep's diagonal-block inverses batched through
``jnp.linalg.inv``, and diagonal blocks pre-inverted after the last sweep for
the triangular applies (reference: async_blockilu_factor.cpp:143-147).
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
)
from ..sparse.bdia import BlockDiaMatrix
from ..sparse.dia import shift_read
from .base import Preconditioner, PrecInfo
from .dia_ilu0 import dia_pairs
from .levels import (
    compute_levels_lower,
    compute_levels_upper,
    exact_block_lower_solve,
    exact_block_upper_solve,
)

__all__ = ["BlockDiaILU0Preconditioner", "bdia_factor_sweep"]


def _bmm(a, b):
    return jnp.einsum("nij,njk->nik", a, b, preferred_element_type=a.dtype)


def bdia_factor_sweep(offsets, pairs, d0, mask, base, ilu):
    """One block Chow–Patel fixed-point sweep on block-DIA storage (pure
    function; shared by local and shard-mapped distributed paths)."""
    bs = base.shape[-1]
    eye = jnp.eye(bs, dtype=base.dtype)
    dmask = mask[d0][:, None, None]
    dinv = invert_diag_blocks(jnp.where(dmask, ilu[d0], eye))
    rows = []
    for d, o in enumerate(offsets):
        s = base[d]
        for (dl, du, o1) in pairs[d]:
            s = s - _bmm(ilu[dl], shift_read(ilu[du], o1))
        if o < 0:
            s = _bmm(s, shift_read(dinv, o))
        rows.append(jnp.where(mask[d][:, None, None], s, 0.0))
    return jnp.stack(rows)


class _BDiaILUState(NamedTuple):
    ilu: jax.Array       # (k, nb, bs, bs)
    ilu_dinv: jax.Array  # (nb, bs, bs) pre-inverted diagonal blocks
    scale: jax.Array | None
    low_level: jax.Array
    up_level: jax.Array


class BlockDiaILU0Preconditioner(Preconditioner):
    def __init__(self, mat: BlockDiaMatrix, nbuildsweeps: int = 1,
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
        self.apply_dtype = apply_dtype  # see dia_ilu0: mixed-precision apply
        self._d0 = mat.offsets.index(0)
        self._pairs = dia_pairs(mat.offsets)
        self._levels = None

    def _build_levels(self):
        if self._levels is None:
            from ..sparse.bdia import block_pattern_csr

            indptr, indices = block_pattern_csr(self.mat)
            low = compute_levels_lower(indptr, indices)
            up = compute_levels_upper(indptr, indices)
            nlow_inner = sum(1 for o in self.mat.offsets if o < 0) + 1
            self._levels = (jnp.asarray(low), int(low.max()) + 1,
                            jnp.asarray(up), int(up.max()) + 1, nlow_inner)
        return self._levels

    def _scaled_base(self, scale):
        """scaleBlock on diagonals: val[i,j] *= s_row[i]·s_col[j]
        (reference: kernels_ilu0_factorize.hpp:61-69); scale is (nb, bs)."""
        A = self.mat
        if scale is None:
            return A.data
        rows = []
        for d, o in enumerate(A.offsets):
            scol = shift_read(scale, o)
            rows.append(A.data[d] * scale[:, :, None] * scol[:, None, :])
        return jnp.stack(rows)

    def _fact_initial(self, base):
        A = self.mat
        if self.fact_init == FactInit.SGS:
            dinv = invert_diag_blocks(base[self._d0])
            rows = []
            for d, o in enumerate(A.offsets):
                if o < 0:
                    prod = _bmm(base[d], shift_read(dinv, o))
                    rows.append(jnp.where(A.mask[d][:, None, None], prod, 0.0))
                else:
                    rows.append(base[d])
            return jnp.stack(rows)
        return base

    def _factor_sweep_fn(self, base):
        A = self.mat
        pairs = self._pairs
        d0 = self._d0

        def sweep(ilu):
            return bdia_factor_sweep(A.offsets, pairs, d0, A.mask, base, ilu)

        return sweep

    def compute(self) -> PrecInfo:
        A = self.mat
        low, nlow, up, nup, fact_inner = self._build_levels()
        scale = None
        if self.use_scaling:
            diag = jnp.diagonal(A.diag_blocks, axis1=-2, axis2=-1)  # (nb, bs)
            scale = 1.0 / jnp.sqrt(diag)
        base = self._scaled_base(scale)

        if self.state is not None and self.fact_init == FactInit.NONE:
            ilu = self.state.ilu
        else:
            ilu = self._fact_initial(base)

        sweep = self._factor_sweep_fn(base)
        info0 = self._nonlinear_res(base, ilu) if self.compute_precinfo else 0.0
        if self.nbuildsweeps == SEQUENTIAL:
            def body(it, x):
                l = it // fact_inner
                xn = sweep(x)
                return jnp.where((low == l)[None, :, None, None], xn, x)

            ilu = jax.lax.fori_loop(0, nlow * fact_inner, body, ilu)
        else:
            ilu = run_sweeps(self.nbuildsweeps, sweep, ilu)

        eye = jnp.eye(A.bs, dtype=base.dtype)
        dmask = A.mask[self._d0][:, None, None]
        ilu_store = ilu if self.apply_dtype is None \
            else ilu.astype(self.apply_dtype)
        self.state = _BDiaILUState(
            ilu=ilu_store,
            ilu_dinv=invert_diag_blocks(jnp.where(dmask, ilu[self._d0], eye)),
            scale=scale,
            low_level=low,
            up_level=up,
        )
        if self.compute_precinfo:
            from .diagnostics import bdia_block_diagonal_dominance
            info1 = self._nonlinear_res(base, ilu)
            ldd_avg, ldd_min, udd_avg, udd_min = \
                bdia_block_diagonal_dominance(A, ilu)
            return PrecInfo(prec_rem_initial_norm=info0,
                            prec_remainder_norm=info1,
                            lower_avg_diag_dom=ldd_avg,
                            lower_min_diag_dom=ldd_min,
                            upper_avg_diag_dom=udd_avg,
                            upper_min_diag_dom=udd_min)
        return PrecInfo()

    def _nonlinear_res(self, base, ilu):
        """Block ILU fixed-point remainder on block-DIA storage
        (reference: block_ilu0_nonlinear_res, async_blockilu_factor.cpp
        :97-141), per block diagonal with shifted batched matmuls."""
        A = self.mat
        udiag = ilu[self._d0]
        total = jnp.zeros((), base.dtype)
        for d, o in enumerate(A.offsets):
            s = base[d]
            for (dl, du, o1) in self._pairs[d]:
                s = s - _bmm(ilu[dl], shift_read(ilu[du], o1))
            if o < 0:
                s = s - _bmm(ilu[d], shift_read(udiag, o))
            else:
                s = s - ilu[d]
            total = total + jnp.sum(
                jnp.abs(jnp.where(A.mask[d][:, None, None], s, 0.0)))
        return total

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        """r, z are (nbrows, bs) block segments."""
        st = state
        A = mat
        _, nlow, _, nup, _ = self._build_levels()
        z = st.scale * r if st.scale is not None else r

        if self.napplysweeps == SEQUENTIAL:
            y = exact_block_lower_solve(A, st.ilu, z, st.low_level, nlow)
            zout = exact_block_upper_solve(A, st.ilu, st.ilu_dinv, y,
                                           st.up_level, nup)
        else:
            y0 = jnp.zeros_like(z)
            y = run_sweeps(self.napplysweeps,
                           lambda y: block_unit_lower_sweep(A, st.ilu, z, y),
                           y0)
            z0 = y if self.apply_init == ApplyInit.JACOBI else jnp.zeros_like(z)
            zout = run_sweeps(self.napplysweeps,
                              lambda zz: block_upper_solve_sweep(
                                  A, st.ilu, st.ilu_dinv, y, zz), z0)

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
