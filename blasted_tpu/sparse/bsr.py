"""Block-sparse-row (BSR) storage, TPU-native.

Equivalent of the reference's block ``SRMatrixStorage`` / ``BSRMatrix``
(reference: include/srmatrixdefs.hpp:37-79, include/blockmatrices.hpp:165-456)
with values held as a ``(nnzb, bs, bs)`` tensor so every block operation is a
batched ``bs×bs`` matmul that XLA tiles onto the MXU.  The reference's
row-major/column-major intra-block layouts (include/blasted_config.hpp:30-37)
collapse to a single native layout here; converters accept an ``order`` flag.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .csr import _compute_diagind, extend_zero, gather_padded

__all__ = ["BSRMatrix", "PaddedBSR"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BSRMatrix:
    """Block CSR matrix; ``vals[k]`` is the bs×bs block of the k-th stored block."""

    rowptr: jax.Array   # (nbrows+1,) int32
    colind: jax.Array   # (nnzb,)  int32
    vals: jax.Array     # (nnzb, bs, bs) float
    diagind: jax.Array  # (nbrows,) int32

    @property
    def nbrows(self) -> int:
        return self.diagind.shape[0]

    @property
    def bs(self) -> int:
        return self.vals.shape[-1]

    @property
    def nnzb(self) -> int:
        return self.colind.shape[0]

    @property
    def nrows(self) -> int:
        return self.nbrows * self.bs

    @property
    def dtype(self):
        return self.vals.dtype

    @staticmethod
    def from_arrays(rowptr, colind, vals, bs: int, diagind=None,
                    order: str = "C") -> "BSRMatrix":
        """Wrap raw BSR arrays.  ``vals`` may be flat ``(nnzb*bs*bs,)``; ``order``
        gives the intra-block layout of flat input ('C' row-major / 'F' col-major,
        the reference's RowMajor/ColMajor split, include/blasted_config.hpp:30-37)."""
        rowptr = np.asarray(rowptr, dtype=np.int32)
        colind = np.asarray(colind, dtype=np.int32)
        vals = np.asarray(vals)
        nnzb = colind.shape[0]
        if vals.ndim == 1:
            if order == "F":
                vals = vals.reshape(nnzb, bs, bs).transpose(0, 2, 1)
            else:
                vals = vals.reshape(nnzb, bs, bs)
        if diagind is None:
            diagind = _compute_diagind(rowptr, colind)
        else:
            diagind = np.asarray(diagind, dtype=np.int32)
        return BSRMatrix(
            rowptr=jnp.asarray(rowptr),
            colind=jnp.asarray(colind),
            vals=jnp.asarray(vals),
            diagind=jnp.asarray(diagind),
        )

    def to_scipy(self):
        import scipy.sparse as sps

        return sps.bsr_matrix(
            (np.asarray(self.vals), np.asarray(self.colind), np.asarray(self.rowptr)),
            shape=(self.nrows, self.nrows),
        )

    def with_vals(self, vals: jax.Array) -> "BSRMatrix":
        return BSRMatrix(self.rowptr, self.colind, vals, self.diagind)

    def astype(self, dtype) -> "BSRMatrix":
        """Value-dtype cast sharing the index arrays (see CSRMatrix.astype)."""
        return self.with_vals(self.vals.astype(dtype))

    # -- assembly / value updates (reference: blockmatrices.hpp:283-344) -----

    def scale_all(self, factor) -> "BSRMatrix":
        """All blocks times ``factor`` (reference: scaleAll)."""
        return self.with_vals(self.vals * factor)

    def block_positions(self, brows, bcols) -> np.ndarray:
        """Host positions of blocks (brows[k], bcols[k]) in the nnzb array."""
        from .csr import _entry_positions
        return _entry_positions(self.rowptr, self.colind, self.nbrows,
                                brows, bcols)

    def submit_blocks(self, brows, bcols, blocks) -> "BSRMatrix":
        """Overwrite blocks (reference: submitBlock,
        blockmatrices.hpp:283-300); ``blocks`` is ``(k, bs, bs)``."""
        pos = jnp.asarray(self.block_positions(brows, bcols))
        return self.with_vals(self.vals.at[pos].set(jnp.asarray(blocks)))

    def update_blocks(self, brows, bcols, blocks) -> "BSRMatrix":
        """Accumulate blocks — the TPU re-expression of the reference's
        atomic updateBlock (blockmatrices.ipp:354): scatter-add is natively
        race-free in XLA (SURVEY.md §2.5 P5)."""
        pos = jnp.asarray(self.block_positions(brows, bcols))
        return self.with_vals(self.vals.at[pos].add(jnp.asarray(blocks)))

    def update_diag_blocks(self, brows, blocks) -> "BSRMatrix":
        """Accumulate into diagonal blocks (reference: updateDiagBlock,
        blockmatrices.ipp:370)."""
        pos = self.diagind[jnp.asarray(np.asarray(brows, dtype=np.int32))]
        return self.with_vals(self.vals.at[pos].add(jnp.asarray(blocks)))

    def pad(self, width: int | None = None) -> "PaddedBSR":
        return PaddedBSR.from_bsr(self, width)

    # -- diagnostic queries (reference: blockmatrices.hpp:419-445; the
    #    scalar diagonal of a BSR matrix = diagonals of its diagonal blocks)

    def diag_entries(self) -> np.ndarray:
        dblocks = np.asarray(self.vals)[np.asarray(self.diagind)]
        return np.diagonal(dblocks, axis1=-2, axis2=-1).reshape(-1)

    def zero_diagonal_row(self) -> int:
        from .csr import _zero_diagonal_row
        return _zero_diagonal_row(self.diag_entries())

    def num_zero_diagonals(self) -> int:
        return int((self.diag_entries() == 0).sum())

    def diagonal_product(self) -> float:
        return float(self.diag_entries().prod())

    def diagonal_abs_sum(self) -> float:
        return float(np.abs(self.diag_entries()).sum())

    def abs_min_diagonal(self) -> float:
        return float(np.abs(self.diag_entries()).min())

    def abs_max_diagonal(self) -> float:
        return float(np.abs(self.diag_entries()).max())

    def is_equal(self, other: "BSRMatrix", tol: float) -> tuple:
        from .csr import _is_equal
        return _is_equal(self, other, tol)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PaddedBSR:
    """Fixed-row-width device form of a BSR matrix (see ``PaddedCSR``).

    Block sweeps contract over padded gathers with
    ``einsum('rwij,rwj->ri')`` — a batched matmul that maps to the MXU.
    """

    pos: jax.Array          # (nbrows, W) int32, sentinel nnzb
    colind: jax.Array       # (nbrows, W) int32, sentinel nbrows
    vals_pad: jax.Array     # (nbrows, W, bs, bs)
    diag_blocks: jax.Array  # (nbrows, bs, bs)
    diagind: jax.Array      # (nbrows,) int32
    lower_mask: jax.Array   # (nbrows, W) bool
    upper_mask: jax.Array   # (nbrows, W) bool
    rowptr: jax.Array       # (nbrows+1,) int32
    nnz_total: jax.Array    # () int32

    @property
    def nbrows(self) -> int:
        return self.pos.shape[0]

    @property
    def width(self) -> int:
        return self.pos.shape[1]

    @property
    def bs(self) -> int:
        return self.vals_pad.shape[-1]

    @property
    def dtype(self):
        return self.vals_pad.dtype

    @staticmethod
    def from_bsr(A: BSRMatrix, width: int | None = None) -> "PaddedBSR":
        rowptr = np.asarray(A.rowptr)
        colind = np.asarray(A.colind)
        n = rowptr.shape[0] - 1
        nnzb = colind.shape[0]
        rownnz = np.diff(rowptr)
        W = int(rownnz.max()) if width is None else int(width)
        if W < int(rownnz.max()):
            raise ValueError(f"width {W} < max row nnz {rownnz.max()}")

        pos = np.full((n, W), nnzb, dtype=np.int32)
        cols = np.full((n, W), n, dtype=np.int32)
        slot = np.arange(W)[None, :]
        valid = slot < rownnz[:, None]
        flat = rowptr[:-1][:, None] + slot
        pos[valid] = flat[valid]
        cols[valid] = colind[flat[valid]]

        rows = np.arange(n)[:, None]
        lower = (cols < rows) & valid
        upper = (cols > rows) & valid

        vals_pad = gather_padded(A.vals, jnp.asarray(pos))
        diag_blocks = A.vals[A.diagind]
        return PaddedBSR(
            pos=jnp.asarray(pos),
            colind=jnp.asarray(cols),
            vals_pad=vals_pad,
            diag_blocks=diag_blocks,
            diagind=A.diagind,
            lower_mask=jnp.asarray(lower),
            upper_mask=jnp.asarray(upper),
            rowptr=A.rowptr,
            nnz_total=jnp.int32(nnzb),
        )

    def gather_x(self, x: jax.Array) -> jax.Array:
        """Gather block segments ``x[colind]`` → ``(nbrows, W, bs)``; sentinels read 0.

        ``x`` is ``(nbrows, bs)`` (block-segment form)."""
        return extend_zero(x)[self.colind]

    def repad_vals(self, vals: jax.Array) -> jax.Array:
        """Pad a new ``(nnzb, bs, bs)`` value array into ``(nbrows, W, bs, bs)``."""
        return gather_padded(vals, self.pos)

    def flat_vals(self) -> jax.Array:
        """Recover the flat ``(nnzb, bs, bs)`` value array from the padded
        form (device scatter; sentinels land in a dropped overflow slot)."""
        nnzb = int(np.asarray(self.nnz_total))
        bs = self.bs
        flat = jnp.zeros((nnzb + 1, bs, bs), self.dtype).at[
            self.pos.reshape(-1)].set(self.vals_pad.reshape(-1, bs, bs))
        return flat[:nnzb]

    def with_new_vals(self, vals: jax.Array) -> "PaddedBSR":
        """Same sparsity, new ``(nnzb, bs, bs)`` values — the value-update
        path (see :meth:`PaddedCSR.with_new_vals`)."""
        import dataclasses

        vals = jnp.asarray(vals)
        return dataclasses.replace(
            self, vals_pad=gather_padded(vals, self.pos),
            diag_blocks=vals[self.diagind])
