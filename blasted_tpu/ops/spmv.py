"""BLAS-2: sparse matrix-vector products.

TPU-native equivalents of the reference's row-parallel SpMV/gemv3
(reference: src/blas/matvecs.cpp:24-182, src/blas/matvecs.hpp:16-65).

On the padded (ELL) device form, ``y = A x`` is a single ``(n, W)`` gather of
``x`` followed by an elementwise product and a width-axis reduction — fully
vectorised on the VPU.  The block form contracts ``(n, W, bs, bs) × (n, W, bs)``
with one ``dot_general``, a batched matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR

__all__ = ["spmv", "gemv3", "bspmv", "bgemv3", "block_matvec"]


def spmv(A, x: jax.Array) -> jax.Array:
    """y = A x (reference: matvecs.cpp csr_matrix_apply, :24-47).

    Format-dispatched: padded CSR (gather+reduce) or DIA (shifted FMAs)."""
    from ..sparse.dia import DiaMatrix
    if isinstance(A, DiaMatrix):
        from .dia import dia_spmv
        return dia_spmv(A, x)
    xg = A.gather_x(x)                       # (n, W); sentinel slots read 0
    return jnp.sum(A.vals_pad * xg, axis=1)


def gemv3(A: PaddedCSR, a: jax.Array, x: jax.Array,
          b: jax.Array, y: jax.Array) -> jax.Array:
    """z = a·A·x + b·y (reference: matvecs.cpp csr_gemv3, :49-75)."""
    return a * spmv(A, x) + b * y


def block_matvec(blocks: jax.Array, segs: jax.Array) -> jax.Array:
    """Batched block·segment products summed over the row width.

    ``blocks``: (n, W, bs, bs); ``segs``: (n, W, bs) → (n, bs).
    One dot_general → MXU.
    """
    return jnp.einsum("rwij,rwj->ri", blocks, segs,
                      preferred_element_type=blocks.dtype)


def bspmv(A, x: jax.Array) -> jax.Array:
    """y = A x for BSR; ``x`` is (nbrows, bs) block-segment form
    (reference: matvecs.cpp bsr_matrix_apply).  Format-dispatched:
    padded BSR or block-DIA."""
    from ..sparse.bdia import BlockDiaMatrix
    if isinstance(A, BlockDiaMatrix):
        from .bdia import bdia_spmv
        return bdia_spmv(A, x)
    xg = A.gather_x(x)                       # (n, W, bs)
    return block_matvec(A.vals_pad, xg)


def bgemv3(A: PaddedBSR, a: jax.Array, x: jax.Array,
           b: jax.Array, y: jax.Array) -> jax.Array:
    """z = a·A·x + b·y in block-segment form."""
    return a * bspmv(A, x) + b * y
