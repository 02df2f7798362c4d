"""DIA (diagonal) storage — the gather-free fast path for banded matrices.

Not present in the reference (which is CPU-cache oriented and happy with CSR);
on TPU, XLA lowers arbitrary gathers to ~8 ns/element scalar loops, so the
ELL/CSR form is memory-latency bound.  Banded matrices — the reference's own
central fixtures (3-D Poisson 7-point stencils, structured-grid CFD Jacobians)
— have a handful of distinct column offsets, and every kernel in this
framework (SpMV, GS/ILU sweeps, even the ILU(0) factorization fixed point)
becomes pure shifted elementwise arithmetic in DIA form: zero gathers, zero
scatters, VPU speed-of-light.

Layout: ``offsets`` (k,) static Python tuple of column offsets (sorted);
``data`` (k, n) with ``data[d, i] = A[i, i+offsets[d]]`` (row-index-aligned);
``mask`` (k, n) marks *structural* nonzeros so that band-fill positions do not
join the ILU(0)/GS pattern (pattern parity with the CSR form is exact).

The ILU(0) fixed-point update becomes per-diagonal:
    pairs(o) = {(o1, o2): o1<0, o2=o−o1>0, both stored}    — see precond/ilu0
    ilu_o[i] = a_o[i] − Σ ilu_o1[i]·ilu_o2[i+o1]  (shifted product, no gather)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .csr import CSRMatrix

__all__ = ["DiaMatrix", "dia_from_csr", "try_dia_from_csr", "shift_read"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DiaMatrix:
    """Diagonal-format sparse matrix with a structural mask."""

    data: jax.Array                # (k, n) float, 0 outside the band/pattern
    mask: jax.Array                # (k, n) bool, structural nonzeros
    offsets: tuple = field(metadata=dict(static=True))  # (k,) python ints

    @property
    def nrows(self) -> int:
        return self.data.shape[1]

    @property
    def ndiags(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def diag_vals(self) -> jax.Array:
        d = self.offsets.index(0)
        return self.data[d]

    @property
    def vals_pad(self) -> jax.Array:
        """Kernel value operand (diagonal-major (k, n) here; the padded-CSR
        counterpart is row-major (n, W)).  Lets format-dispatched kernels and
        the preconditioner classes treat both layouts uniformly."""
        return self.data

    @property
    def nnz(self) -> int:
        return int(np.asarray(self.mask).sum())

    def with_new_data(self, data: jax.Array) -> "DiaMatrix":
        """Same band structure, new ``(k, n)`` values (masked to the
        structural pattern) — the value-update path (reference:
        blasted_petsc.cpp:314-327 recompute-in-place pattern)."""
        data = jnp.where(self.mask, jnp.asarray(data), 0.0)
        return DiaMatrix(data=data, mask=self.mask, offsets=self.offsets)

    def to_scipy(self):
        import scipy.sparse as sps

        n = self.nrows
        rows, cols, vals = [], [], []
        data = np.asarray(self.data)
        mask = np.asarray(self.mask)
        for d, o in enumerate(self.offsets):
            i = np.nonzero(mask[d])[0]
            rows.append(i)
            cols.append(i + o)
            vals.append(data[d, i])
        return sps.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))), shape=(n, n)).tocsr()


def dia_from_csr(A: CSRMatrix) -> DiaMatrix:
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    vals = np.asarray(A.vals)
    n = rowptr.shape[0] - 1
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    offs = colind.astype(np.int64) - rows
    uniq = np.unique(offs)
    k = uniq.shape[0]
    data = np.zeros((k, n), dtype=vals.dtype)
    mask = np.zeros((k, n), dtype=bool)
    dmap = {int(o): d for d, o in enumerate(uniq)}
    dsel = np.array([dmap[int(o)] for o in offs])
    data[dsel, rows] = vals
    mask[dsel, rows] = True
    return DiaMatrix(data=jnp.asarray(data), mask=jnp.asarray(mask),
                     offsets=tuple(int(o) for o in uniq))


def try_dia_from_csr(A: CSRMatrix, max_diags: int = 64) -> DiaMatrix | None:
    """Detect whether A is band-structured enough for the DIA fast path."""
    rowptr = np.asarray(A.rowptr)
    colind = np.asarray(A.colind)
    n = rowptr.shape[0] - 1
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    offs = np.unique(colind.astype(np.int64) - rows)
    if offs.shape[0] > max_diags:
        return None
    return dia_from_csr(A)


def shift_read(x: jax.Array, o: int) -> jax.Array:
    """Return s with s[i] = x[i+o] along axis 0 (zero beyond the ends) as a
    sliced read of one shared zero-padded buffer — fuses into consumers, no
    materialised copies per diagonal.  Works for (n,), (n, bs) segment and
    (n, bs, bs) block arrays alike."""
    if o == 0:
        return x
    tail = x.shape[1:]
    if o > 0:
        z = jnp.zeros((o,) + tail, x.dtype)
        return jnp.concatenate([x[o:], z])
    z = jnp.zeros((-o,) + tail, x.dtype)
    return jnp.concatenate([z, x[:o]])


def shifts_table(x: jax.Array, offsets) -> list:
    """All shifted reads sharing one padded buffer (one materialisation)."""
    n = x.shape[0]
    lo = max(0, *(o for o in offsets)) if offsets else 0
    hi = max(0, *(-o for o in offsets)) if offsets else 0
    xp = jnp.concatenate([jnp.zeros((hi,), x.dtype), x,
                          jnp.zeros((lo,), x.dtype)])
    return [jax.lax.dynamic_slice(xp, (hi + o,), (n,)) for o in offsets]
