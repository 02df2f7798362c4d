"""Matrix-property diagnostics feeding PrecInfo.

Equivalent of the reference's ``diagonal_dominance`` one-kernel 4-way
reduction (reference: src/matrix_properties.cpp:10-78): for a factored matrix
holding L (unit diagonal implied) and U in one layout,

    ldd_i = 1 − Σ_{j<i}|l_ij|
    udd_i = 1 − Σ_{j>=i, j≠i}|u_ij| / |u_ii|

returning (L avg, L min, U avg, U min) over rows.  Used to assess ILU factor
quality (reference: async_ilu_factor.cpp:88-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sweeps import _bmasked, _masked
from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR
from ..sparse.dia import DiaMatrix

__all__ = ["diagonal_dominance", "block_diagonal_dominance",
           "bdia_block_diagonal_dominance"]


def diagonal_dominance(A, vals) -> tuple:
    """Scalar variant; ``vals`` holds the factor values in A's layout
    ((n,W) padded for CSR, (k,n) for DIA)."""
    if isinstance(A, DiaMatrix):
        low = [d for d, o in enumerate(A.offsets) if o < 0]
        up = [d for d, o in enumerate(A.offsets) if o > 0]
        lsum = sum((jnp.abs(vals[d]) for d in low), jnp.zeros(A.nrows, A.dtype))
        usum = sum((jnp.abs(vals[d]) for d in up), jnp.zeros(A.nrows, A.dtype))
        udiag = vals[A.offsets.index(0)]
    else:
        lsum = jnp.sum(jnp.abs(_masked(vals, A.lower_mask)), axis=1)
        usum = jnp.sum(jnp.abs(_masked(vals, A.upper_mask)), axis=1)
        udiag = _diag_from_pad(A, vals)
    ldd = 1.0 - lsum
    udd = 1.0 - usum / jnp.abs(udiag)
    return (jnp.mean(ldd), jnp.min(ldd), jnp.mean(udd), jnp.min(udd))


def _diag_from_pad(A: PaddedCSR, vals_pad: jax.Array) -> jax.Array:
    """Diagonal values out of the (n, W) padded layout."""
    is_diag = (~A.lower_mask) & (~A.upper_mask) & (A.colind < A.nrows)
    return jnp.sum(jnp.where(is_diag, vals_pad, 0.0), axis=1)


def block_diagonal_dominance(A: PaddedBSR, vals_pad: jax.Array) -> tuple:
    """Block variant (reference: matrix_properties.cpp:19-75): the upper sum
    includes the off-diagonal entries of the diagonal block."""
    bs = A.bs
    eye = jnp.eye(bs, dtype=bool)
    # per scalar-row sums: reduce over row width (axis 1) and block column (3)
    lsum = jnp.sum(jnp.abs(_bmasked(vals_pad, A.lower_mask)), axis=(1, 3))
    # strict-upper blocks
    usum = jnp.sum(jnp.sum(jnp.abs(_bmasked(vals_pad, A.upper_mask)), axis=1), axis=2)
    # plus off-diagonal entries of the diagonal block
    is_diag = (~A.lower_mask) & (~A.upper_mask) & (A.colind < A.nbrows)
    dblk = jnp.sum(jnp.where(is_diag[:, :, None, None], vals_pad, 0.0), axis=1)
    offdiag = jnp.where(eye, 0.0, jnp.abs(dblk)).sum(axis=2)   # (nbrows, bs)
    usum = usum + offdiag
    ddiag = jnp.abs(jnp.diagonal(dblk, axis1=1, axis2=2))       # (nbrows, bs)
    ldd = 1.0 - lsum
    udd = 1.0 - usum / ddiag
    return (jnp.mean(ldd), jnp.min(ldd), jnp.mean(udd), jnp.min(udd))


def bdia_block_diagonal_dominance(A, ilu) -> tuple:
    """Block diagonal dominance on block-DIA factor storage
    (same quantities as :func:`block_diagonal_dominance`; reference:
    matrix_properties.cpp:19-75).  ``ilu`` is the SoA component layout
    (k × bs² × (nbrows,)); masked slots are structurally zero and
    contribute nothing."""
    bs = A.bs
    low = [d for d, o in enumerate(A.offsets) if o < 0]
    up = [d for d, o in enumerate(A.offsets) if o > 0]
    d0 = A.offsets.index(0)
    dt = ilu[0][0].dtype
    zero = jnp.zeros((A.nbrows,), dt)

    def row_sums(diags, skip_diag_entry=False):
        # per scalar-row |·| sums: for block-row component i, sum over j
        out = []
        for i in range(bs):
            acc = zero
            for d in diags:
                for j in range(bs):
                    if skip_diag_entry and d == d0 and i == j:
                        continue
                    acc = acc + jnp.abs(ilu[d][i * bs + j])
            out.append(acc)
        return out

    lsum = row_sums(low)
    usum = row_sums(up + [d0], skip_diag_entry=True)
    ddiag = [jnp.abs(ilu[d0][i * bs + i]) for i in range(bs)]
    ldd = jnp.stack([1.0 - s for s in lsum], axis=1)
    udd = jnp.stack([1.0 - u / jnp.where(d == 0, 1.0, d)
                     for u, d in zip(usum, ddiag)], axis=1)
    return (jnp.mean(ldd), jnp.min(ldd), jnp.mean(udd), jnp.min(udd))
