"""DIA-format kernels: SpMV and triangular products as shifted FMAs.

Counterparts of the padded-CSR kernels in ops/sweeps.py and ops/spmv.py for
:class:`~blasted_tpu.sparse.dia.DiaMatrix`.  Every product is
``Σ_d data[d] * x[·+off_d]`` over the selected diagonals — shifted reads of
one shared zero-padded buffer, no gathers (see sparse/dia.py rationale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.dia import DiaMatrix, shifts_table

__all__ = ["dia_mv", "dia_spmv", "dia_lower_mv", "dia_upper_mv"]


def dia_mv(A: DiaMatrix, data: jax.Array, x: jax.Array, which: str) -> jax.Array:
    """Σ over selected diagonals of data[d] * x shifted by off_d.

    which: 'all' | 'lower' (off<0) | 'upper' (off>0).
    """
    sel = {
        "all": lambda o: True,
        "lower": lambda o: o < 0,
        "upper": lambda o: o > 0,
    }[which]
    idx = [d for d, o in enumerate(A.offsets) if sel(o)]
    if not idx:
        return jnp.zeros_like(x)
    offs = [A.offsets[d] for d in idx]
    shifted = shifts_table(x, offs)
    acc = data[idx[0]] * shifted[0]
    for t, d in enumerate(idx[1:], start=1):
        acc = acc + data[d] * shifted[t]
    return acc


def dia_spmv(A: DiaMatrix, x: jax.Array) -> jax.Array:
    from .stencil import (
        dia_spmv_stencil, pad_vec, stencil_gate, unpad_vec,
    )

    plan = stencil_gate(A.offsets, A.nrows, jnp.dtype(x.dtype).itemsize)
    if plan is not None and x.dtype == A.dtype:
        # large-halo band on a real TPU: the Pallas halo-ring kernel (the
        # XLA-fused shifted reads re-fetch x per diagonal past a ~0.5 MB
        # window — ops/stencil.py)
        T, _ = plan
        return unpad_vec(
            dia_spmv_stencil(A.offsets, A.data, pad_vec(x, T), T), T)
    return dia_mv(A, A.data, x, "all")


def dia_gemv3(A: DiaMatrix, a, x: jax.Array, b, y: jax.Array) -> jax.Array:
    """z = a·A·x + b·y (reference: gemv3, src/blas/matvecs.cpp:24-182);
    the scale/accumulate fuses into the shifted-FMA SpMV pass under jit."""
    return a * dia_mv(A, A.data, x, "all") + b * y


def dia_lower_mv(A: DiaMatrix, data: jax.Array, x: jax.Array) -> jax.Array:
    return dia_mv(A, data, x, "lower")


def dia_upper_mv(A: DiaMatrix, data: jax.Array, x: jax.Array) -> jax.Array:
    return dia_mv(A, data, x, "upper")
