"""Block-DIA kernels: shifted batched-matmul products on the MXU.

Counterparts of the padded-BSR block kernels for
:class:`~blasted_tpu.sparse.bdia.BlockDiaMatrix`: each selected block
diagonal contributes ``data[d, i] @ x[i + off_d]`` — one einsum batched over
rows, shifted block-segment reads, zero gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.bdia import BlockDiaMatrix
from ..sparse.dia import shift_read

__all__ = ["bdia_mv", "bdia_spmv", "bdia_gemv3", "bdia_lower_mv",
           "bdia_upper_mv"]


def _term(blocks: jax.Array, seg: jax.Array) -> jax.Array:
    return jnp.einsum("rij,rj->ri", blocks, seg,
                      preferred_element_type=blocks.dtype)


def bdia_mv(A: BlockDiaMatrix, data: jax.Array, x: jax.Array,
            which: str) -> jax.Array:
    """x is (nbrows, bs); selects diagonals by sign of offset."""
    sel = {"all": lambda o: True, "lower": lambda o: o < 0,
           "upper": lambda o: o > 0}[which]
    idx = [d for d, o in enumerate(A.offsets) if sel(o)]
    if not idx:
        return jnp.zeros_like(x)
    acc = _term(data[idx[0]], shift_read(x, A.offsets[idx[0]]))
    for d in idx[1:]:
        acc = acc + _term(data[d], shift_read(x, A.offsets[d]))
    return acc


def bdia_spmv(A: BlockDiaMatrix, x: jax.Array) -> jax.Array:
    return bdia_mv(A, A.data, x, "all")


def bdia_gemv3(A: BlockDiaMatrix, a, x: jax.Array, b, y: jax.Array) -> jax.Array:
    """z = a·A·x + b·y on (nbrows, bs) block vectors (reference: gemv3,
    src/blas/matvecs.cpp:107-182); fuses into the batched-matmul pass."""
    return a * bdia_mv(A, A.data, x, "all") + b * y


def bdia_lower_mv(A: BlockDiaMatrix, data: jax.Array, x: jax.Array) -> jax.Array:
    return bdia_mv(A, data, x, "lower")


def bdia_upper_mv(A: BlockDiaMatrix, data: jax.Array, x: jax.Array) -> jax.Array:
    return bdia_mv(A, data, x, "upper")
