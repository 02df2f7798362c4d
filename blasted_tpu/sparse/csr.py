"""Compressed-sparse-row storage, TPU-native.

Re-expresses the reference's central storage type ``SRMatrixStorage``
(reference: include/srmatrixdefs.hpp:37-79) as JAX pytrees:

- :class:`CSRMatrix` — the canonical host/device CSR container
  (``rowptr, colind, vals, diagind``), scalar entries.
- :class:`PaddedCSR` — the *device compute form*: every row padded to a fixed
  width ``W`` (ELL-style) with sentinel indices, so that SpMV and all sweep
  kernels become a single ``(n, W)`` gather + FMA + masked reduction.  This is
  the TPU answer to the reference's per-row OpenMP loops — static shapes,
  no data-dependent control flow, full VPU/MXU utilisation.

Sentinel convention: padded slots hold ``colind == nrows`` and ``pos == nnz``.
Gathers go through arrays extended by one trailing zero, so padded slots
contribute exactly 0 to every reduction without explicit masking of values.
Triangular masks (lower/upper) are precomputed boolean ``(n, W)`` arrays,
mirroring the reference's triangular row-pointer views
(reference: include/srmatrixdefs.hpp:171-189, src/rawsrmatrixutils.cpp:120-247).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CSRMatrix", "PaddedCSR", "gather_padded", "extend_zero"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CSRMatrix:
    """Scalar CSR matrix with stored diagonal locations.

    Equivalent of ``SRMatrixStorage<scalar,index>`` at block size 1
    (reference: include/srmatrixdefs.hpp:37-79).  ``browendptr`` of the
    reference (partial row views) is not stored; triangular views live on
    :class:`PaddedCSR` masks instead.
    """

    rowptr: jax.Array   # (n+1,) int32
    colind: jax.Array   # (nnz,)  int32, sorted within each row
    vals: jax.Array     # (nnz,)  float
    diagind: jax.Array  # (n,)    int32 — position of a_ii within vals

    @property
    def nrows(self) -> int:
        return self.diagind.shape[0]

    @property
    def nnz(self) -> int:
        return self.colind.shape[0]

    @property
    def dtype(self):
        return self.vals.dtype

    # -- construction -------------------------------------------------------

    @staticmethod
    def from_arrays(rowptr, colind, vals, diagind=None) -> "CSRMatrix":
        """Wrap raw CSR arrays; compute ``diagind`` if not given.

        Mirrors the wrapping constructor of ``SRMatrixStorage``
        (reference: src/rawsrmatrixutils.cpp:29-97).
        """
        rowptr = np.asarray(rowptr, dtype=np.int32)
        colind = np.asarray(colind, dtype=np.int32)
        vals = np.asarray(vals)
        if diagind is None:
            diagind = _compute_diagind(rowptr, colind)
        else:
            diagind = np.asarray(diagind, dtype=np.int32)
        return CSRMatrix(
            rowptr=jnp.asarray(rowptr),
            colind=jnp.asarray(colind),
            vals=jnp.asarray(vals),
            diagind=jnp.asarray(diagind),
        )

    @staticmethod
    def from_scipy(sp) -> "CSRMatrix":
        sp = sp.tocsr()
        sp.sort_indices()
        return CSRMatrix.from_arrays(sp.indptr, sp.indices, sp.data)

    def to_scipy(self):
        import scipy.sparse as sps

        return sps.csr_matrix(
            (np.asarray(self.vals), np.asarray(self.colind), np.asarray(self.rowptr)),
            shape=(self.nrows, self.nrows),
        )

    def with_vals(self, vals: jax.Array) -> "CSRMatrix":
        """Same sparsity, new values — the reference's pattern of ILU factors
        sharing the original matrix's index arrays (include/solverops_ilu0.hpp:74-78)."""
        return CSRMatrix(self.rowptr, self.colind, vals, self.diagind)

    def astype(self, dtype) -> "CSRMatrix":
        """Value-dtype cast sharing the index arrays (float32 working tier
        for the f64-less TPU chips; indices stay int32)."""
        return self.with_vals(self.vals.astype(dtype))

    # -- assembly / value updates (reference: blockmatrices.hpp:283-344) -----

    def scale_all(self, factor) -> "CSRMatrix":
        """All values times ``factor`` (reference: scaleAll,
        blockmatrices.ipp).  Functional: returns a new container sharing the
        index arrays."""
        return self.with_vals(self.vals * factor)

    def entry_positions(self, rows, cols) -> np.ndarray:
        """Host positions of entries (rows[k], cols[k]) in the nnz array
        (the per-entry ``inner_search`` of the reference, vectorised;
        reference: helper_algorithms.hpp:38-52)."""
        return _entry_positions(self.rowptr, self.colind, self.nrows,
                                rows, cols)

    def submit_entries(self, rows, cols, vals) -> "CSRMatrix":
        """Overwrite entries (rows[k], cols[k]) = vals[k]
        (reference: submitBlock, blockmatrices.hpp:283-300 — the
        non-accumulating assembly form)."""
        pos = jnp.asarray(self.entry_positions(rows, cols))
        return self.with_vals(self.vals.at[pos].set(jnp.asarray(vals)))

    def update_entries(self, rows, cols, vals) -> "CSRMatrix":
        """Accumulate vals[k] into entries (rows[k], cols[k]) — the TPU
        re-expression of the reference's atomic updateBlock
        (blockmatrices.ipp:354,652): scatter-add is natively race-free in
        XLA (SURVEY.md §2.5 P5).  Duplicate (row, col) pairs accumulate."""
        pos = jnp.asarray(self.entry_positions(rows, cols))
        return self.with_vals(self.vals.at[pos].add(jnp.asarray(vals)))

    def update_diag_entries(self, rows, vals) -> "CSRMatrix":
        """Accumulate into diagonal entries (reference: updateDiagBlock,
        blockmatrices.ipp:370,680)."""
        pos = self.diagind[jnp.asarray(np.asarray(rows, dtype=np.int32))]
        return self.with_vals(self.vals.at[pos].add(jnp.asarray(vals)))

    def pad(self, width: int | None = None) -> "PaddedCSR":
        return PaddedCSR.from_csr(self, width)

    # -- diagnostic queries (reference: blockmatrices.hpp:419-445) ----------

    def diag_entries(self) -> np.ndarray:
        """Host array of the scalar diagonal entries a_ii."""
        return np.asarray(self.vals)[np.asarray(self.diagind)]

    def zero_diagonal_row(self) -> int:
        """First row with a zero diagonal, −1 if none
        (reference: zeroDiagonalRow, blockmatrices.ipp)."""
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

    def is_equal(self, other: "CSRMatrix", tol: float) -> tuple:
        """5 booleans: equal (nrows, rowptr, colind, vals within tol,
        diagind) — reference isEqual (blockmatrices.hpp:429)."""
        return _is_equal(self, other, tol)


def _zero_diagonal_row(diag: np.ndarray) -> int:
    z = np.nonzero(diag == 0)[0]
    return int(z[0]) if z.size else -1


def _is_equal(a, b, tol: float) -> tuple:
    same_n = a.nrows == b.nrows
    same_rp = same_n and bool(
        np.array_equal(np.asarray(a.rowptr), np.asarray(b.rowptr)))
    same_ci = same_rp and bool(
        np.array_equal(np.asarray(a.colind), np.asarray(b.colind)))
    same_v = same_ci and bool(
        np.all(np.abs(np.asarray(a.vals) - np.asarray(b.vals)) <= tol))
    same_di = same_n and bool(
        np.array_equal(np.asarray(a.diagind), np.asarray(b.diagind)))
    return (same_n, same_rp, same_ci, same_v, same_di)


def _entry_positions(rowptr, colind, n: int, rows, cols) -> np.ndarray:
    """Positions of (rows[k], cols[k]) in the CSR nnz array via one global
    searchsorted over row-major (row, col) keys; raises if any entry is not
    in the sparsity pattern (matching the reference's assert in
    updateBlock)."""
    rowptr = np.asarray(rowptr)
    colind = np.asarray(colind)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    all_rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rowptr))
    keys = all_rows * n + colind.astype(np.int64)
    want = rows * n + cols
    pos = np.searchsorted(keys, want)
    ok = (pos < keys.shape[0]) & \
        (keys[np.minimum(pos, keys.shape[0] - 1)] == want)
    if not ok.all():
        bad = int(np.nonzero(~ok)[0][0])
        raise ValueError(f"entry ({rows[bad]}, {cols[bad]}) not in the "
                         "sparsity pattern")
    return pos.astype(np.int32)


def _compute_diagind(rowptr: np.ndarray, colind: np.ndarray) -> np.ndarray:
    """Position of each row's diagonal entry (vectorised: one global
    searchsorted over the row-major-sorted (row, col) keys)."""
    n = rowptr.shape[0] - 1
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rowptr))
    key_all = rows * n + colind.astype(np.int64)
    want = np.arange(n, dtype=np.int64) * (n + 1)
    pos = np.searchsorted(key_all, want)
    ok = (pos < key_all.shape[0]) & \
        (key_all[np.minimum(pos, key_all.shape[0] - 1)] == want)
    if not ok.all():
        missing = int(np.nonzero(~ok)[0][0])
        raise ValueError(f"Row {missing} has no diagonal entry")
    return pos.astype(np.int32)


def extend_zero(arr: jax.Array) -> jax.Array:
    """Append one zero entry/block so sentinel gathers read 0."""
    pad_shape = (1,) + arr.shape[1:]
    return jnp.concatenate([arr, jnp.zeros(pad_shape, dtype=arr.dtype)], axis=0)


def gather_padded(values: jax.Array, pos: jax.Array) -> jax.Array:
    """Gather an nnz-indexed value array into padded ``(n, W, ...)`` form.

    ``pos`` uses the sentinel ``nnz`` for padding; the value array is extended
    by a zero so padded slots read 0.  Works for scalar ``(nnz,)`` and block
    ``(nnz, bs, bs)`` value arrays alike.
    """
    return extend_zero(values)[pos]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PaddedCSR:
    """Fixed-row-width (ELL-style) device form of a CSR matrix.

    The layout decision motivated in SURVEY.md §7 ("sparse-format padding
    economics"): pad every row to the maximum row length ``W``; all kernels
    become dense ``(n, W)`` operations.
    """

    pos: jax.Array         # (n, W) int32 — index into the nnz array, sentinel nnz
    colind: jax.Array      # (n, W) int32 — column index, sentinel n
    vals_pad: jax.Array    # (n, W) float — matrix values, 0 at padding
    diag_vals: jax.Array   # (n,)  float  — a_ii
    diagind: jax.Array     # (n,)  int32  — position of a_ii in the nnz array
    lower_mask: jax.Array  # (n, W) bool  — strictly-lower entries
    upper_mask: jax.Array  # (n, W) bool  — strictly-upper entries
    rowptr: jax.Array      # (n+1,) int32 — kept for conversions back to CSR
    nnz_total: jax.Array   # ()   int32  — number of stored nonzeros

    @property
    def nrows(self) -> int:
        return self.pos.shape[0]

    @property
    def width(self) -> int:
        return self.pos.shape[1]

    @property
    def dtype(self):
        return self.vals_pad.dtype

    @staticmethod
    def from_csr(A: CSRMatrix, width: int | None = None) -> "PaddedCSR":
        rowptr = np.asarray(A.rowptr)
        colind = np.asarray(A.colind)
        n = rowptr.shape[0] - 1
        nnz = colind.shape[0]
        rownnz = np.diff(rowptr)
        W = int(rownnz.max()) if width is None else int(width)
        if W < int(rownnz.max()):
            raise ValueError(f"width {W} < max row nnz {rownnz.max()}")

        pos = np.full((n, W), nnz, dtype=np.int32)
        cols = np.full((n, W), n, dtype=np.int32)
        # vectorised fill: slot j of row i is rowptr[i]+j where j < rownnz[i]
        slot = np.arange(W)[None, :]
        valid = slot < rownnz[:, None]
        flat = rowptr[:-1][:, None] + slot
        pos[valid] = flat[valid]
        cols[valid] = colind[flat[valid]]

        rows = np.arange(n)[:, None]
        lower = (cols < rows) & valid
        upper = (cols > rows) & valid

        vals_pad = gather_padded(A.vals, jnp.asarray(pos))
        diag_vals = A.vals[A.diagind]
        return PaddedCSR(
            pos=jnp.asarray(pos),
            colind=jnp.asarray(cols),
            vals_pad=vals_pad,
            diag_vals=diag_vals,
            diagind=A.diagind,
            lower_mask=jnp.asarray(lower),
            upper_mask=jnp.asarray(upper),
            rowptr=A.rowptr,
            nnz_total=jnp.int32(nnz),
        )

    def gather_x(self, x: jax.Array) -> jax.Array:
        """Gather ``x[colind]`` in padded form; sentinel slots read 0."""
        return extend_zero(x)[self.colind]

    def repad_vals(self, vals: jax.Array) -> jax.Array:
        """Pad a new nnz-value array (e.g. ILU factors) into ``(n, W)`` form."""
        return gather_padded(vals, self.pos)

    def flat_vals(self) -> jax.Array:
        """Recover the flat ``(nnz,)`` value array from the padded form
        (device scatter; sentinel slots land in a dropped overflow slot)."""
        nnz = int(np.asarray(self.nnz_total))
        flat = jnp.zeros((nnz + 1,), self.dtype).at[
            self.pos.reshape(-1)].set(self.vals_pad.reshape(-1))
        return flat[:nnz]

    def with_new_vals(self, vals: jax.Array) -> "PaddedCSR":
        """Same sparsity, new numerical values (flat ``(nnz,)``) — the
        value-update path for the PCSetUp-every-Newton-step pattern
        (reference: blasted_petsc.cpp:314-327 recomputes over the same
        symbolic data).  Only the value-derived fields are rebuilt."""
        import dataclasses

        vals = jnp.asarray(vals)
        return dataclasses.replace(
            self, vals_pad=gather_padded(vals, self.pos),
            diag_vals=vals[self.diagind])
