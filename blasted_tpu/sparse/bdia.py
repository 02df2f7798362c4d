"""Block-DIA storage: block diagonals for banded point-block matrices.

The block analogue of :mod:`blasted_tpu.sparse.dia` for the reference's
point-block focus (bs = 4, 5, arbitrary — structured-grid CFD Jacobians,
reference: include/blockmatrices.hpp, arXiv:1912.00539): block-column offsets
collapse to a static set, values live as ``data[d, i] ∈ R^{bs×bs}``, and
every kernel is a *shifted batched matmul* on the MXU —

    y[i] = Σ_d data[d, i] @ x[i + off_d]     (no gathers, no scatters).

A structural ``mask[d, i]`` keeps band-fill out of the ILU/GS pattern exactly
as in the scalar DIA form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .bsr import BSRMatrix

__all__ = ["BlockDiaMatrix", "bdia_from_bsr", "try_bdia_from_bsr"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockDiaMatrix:
    """Block-diagonal-format sparse matrix with a structural mask."""

    data: jax.Array                # (k, nbrows, bs, bs)
    mask: jax.Array                # (k, nbrows) bool
    offsets: tuple = field(metadata=dict(static=True))

    @property
    def nbrows(self) -> int:
        return self.data.shape[1]

    @property
    def bs(self) -> int:
        return self.data.shape[-1]

    @property
    def nrows(self) -> int:
        return self.nbrows * self.bs

    @property
    def ndiags(self) -> int:
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def diag_blocks(self) -> jax.Array:
        return self.data[self.offsets.index(0)]

    @property
    def vals_pad(self) -> jax.Array:
        """Kernel value operand (diag-major here; see DiaMatrix.vals_pad)."""
        return self.data

    def with_new_data(self, data: jax.Array) -> "BlockDiaMatrix":
        """Same band structure, new ``(k, nbrows, bs, bs)`` values (masked to
        the structural pattern) — the value-update path (see
        :meth:`DiaMatrix.with_new_data`)."""
        data = jnp.where(self.mask[:, :, None, None], jnp.asarray(data), 0.0)
        return BlockDiaMatrix(data=data, mask=self.mask, offsets=self.offsets)

    def to_scipy(self):
        return _to_scipy_coo(self.offsets, np.asarray(self.data),
                             np.asarray(self.mask), self.nbrows, self.bs)


def _to_scipy_coo(offsets, data, mask, nb, bs):
    import scipy.sparse as sps

    rows, cols, vals = [], [], []
    for d, o in enumerate(offsets):
        i = np.nonzero(mask[d])[0]
        for ib in range(bs):
            for jb in range(bs):
                rows.append(i * bs + ib)
                cols.append((i + o) * bs + jb)
                vals.append(data[d, i, ib, jb])
    return sps.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nb * bs, nb * bs)).tocsr()


def block_pattern_csr(A: BlockDiaMatrix):
    """Block-granularity sparsity pattern as (indptr, indices) — for level
    scheduling and other symbolic passes."""
    import scipy.sparse as sps

    mask = np.asarray(A.mask)
    nb = A.nbrows
    rows, cols = [], []
    for d, o in enumerate(A.offsets):
        i = np.nonzero(mask[d])[0]
        rows.append(i)
        cols.append(i + o)
    sp = sps.coo_matrix(
        (np.ones(sum(len(r) for r in rows)),
         (np.concatenate(rows), np.concatenate(cols))), shape=(nb, nb)).tocsr()
    sp.sort_indices()
    return sp.indptr, sp.indices


def bdia_from_bsr(B: BSRMatrix) -> BlockDiaMatrix:
    rowptr = np.asarray(B.rowptr)
    colind = np.asarray(B.colind)
    vals = np.asarray(B.vals)
    nb, bs = B.nbrows, B.bs
    rows = np.repeat(np.arange(nb), np.diff(rowptr))
    offs = colind.astype(np.int64) - rows
    uniq = np.unique(offs)
    k = uniq.shape[0]
    data = np.zeros((k, nb, bs, bs), dtype=vals.dtype)
    mask = np.zeros((k, nb), dtype=bool)
    dmap = {int(o): d for d, o in enumerate(uniq)}
    dsel = np.array([dmap[int(o)] for o in offs])
    data[dsel, rows] = vals
    mask[dsel, rows] = True
    return BlockDiaMatrix(data=jnp.asarray(data), mask=jnp.asarray(mask),
                          offsets=tuple(int(o) for o in uniq))


def try_bdia_from_bsr(B: BSRMatrix, max_diags: int = 32) -> BlockDiaMatrix | None:
    rowptr = np.asarray(B.rowptr)
    colind = np.asarray(B.colind)
    nb = B.nbrows
    rows = np.repeat(np.arange(nb), np.diff(rowptr))
    offs = np.unique(colind.astype(np.int64) - rows)
    if offs.shape[0] > max_diags:
        return None
    return bdia_from_bsr(B)
