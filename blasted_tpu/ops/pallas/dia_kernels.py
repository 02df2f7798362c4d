"""Pallas TPU kernels for DIA (diagonal) sparse operations.

The XLA DIA path (ops/dia.py) re-reads the x vector once per diagonal because
each shifted slice is a separate HBM consumer.  This kernel tiles the row
space, DMAs each tile's x-window (tile + halo) into VMEM **once**, and forms
all k shifted products from that single VMEM copy — bringing the traffic down
to the model minimum  data(k·n) + x(n) + y(n).

Structure (see pallas_guide.md: Async DMA + Double Buffering):
- x is zero-padded by the halo on the host (one-time, amortised across
  sweeps) and stays in HBM (`memory_space=ANY`);
- the (k, n) diagonal data streams through VMEM via the standard BlockSpec
  pipeline;
- the x window for tile t, ``xp[tC : tC + C + halo]``, is hand double-buffered
  across sequential grid steps with two explicit VMEM buffers selected by
  even/odd predication (Mosaic cannot slice a stacked buffer on the slot
  axis), scratch state persisting between grid iterations on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_matvec_pallas"]


def _kernel(xp_ref, data_ref, y_ref, buf0, buf1, sems,
            *, offsets, hi, C, win, T):
    t = pl.program_id(0)
    even = jax.lax.rem(t, 2) == 0

    def start(tile, buf, sem_ix):
        pltpu.make_async_copy(
            xp_ref.at[pl.ds(tile * C, win)], buf, sems.at[sem_ix]).start()

    def wait(tile, buf, sem_ix):
        pltpu.make_async_copy(
            xp_ref.at[pl.ds(tile * C, win)], buf, sems.at[sem_ix]).wait()

    @pl.when(t == 0)
    def _():
        start(t, buf0, 0)

    @pl.when(even & (t + 1 < T))
    def _():
        start(t + 1, buf1, 1)

    @pl.when(~even & (t + 1 < T))
    def _():
        start(t + 1, buf0, 0)

    def compute(buf):
        acc = data_ref[0, :] * buf[pl.ds(hi + offsets[0], C)]
        for d, o in enumerate(offsets[1:], start=1):
            acc = acc + data_ref[d, :] * buf[pl.ds(hi + o, C)]
        y_ref[:] = acc

    @pl.when(even)
    def _():
        wait(t, buf0, 0)
        compute(buf0)

    @pl.when(~even)
    def _():
        wait(t, buf1, 1)
        compute(buf1)


def dia_matvec_pallas(data: jax.Array, offsets, x: jax.Array,
                      tile: int = 128 * 1024, interpret: bool = False) -> jax.Array:
    """y[i] = Σ_d data[d, i] · x[i + offsets[d]] — the DIA matvec.

    ``data`` may be any (k, n) value array sharing the band structure (matrix
    values, ILU factors, masked subsets with zeros), so this single kernel
    serves SpMV and the triangular-sweep products alike.
    """
    offsets = tuple(int(o) for o in offsets)
    k, n = data.shape
    lo = max(0, max(offsets))
    hi = max(0, -min(offsets))

    C = min(tile, n)
    npad = (-n) % C
    if npad:
        data = jnp.pad(data, ((0, 0), (0, npad)))
        x = jnp.pad(x, (0, npad))
    ntot = n + npad
    T = ntot // C
    win = C + hi + lo

    xp = jnp.pad(x, (hi, lo))

    y = pl.pallas_call(
        functools.partial(_kernel, offsets=offsets, hi=hi, C=C, win=win, T=T),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, C), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C,), lambda t: (t,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntot,), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((win,), data.dtype),
            pltpu.VMEM((win,), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, data)
    return y[:n] if npad else y
