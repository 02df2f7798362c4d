"""Block-DIA storage: block diagonals for banded point-block matrices.

The block analogue of :mod:`blasted_tpu.sparse.dia` for the reference's
point-block focus (bs = 4, 5, arbitrary — structured-grid CFD Jacobians,
reference: include/blockmatrices.hpp, arXiv:1912.00539): block-column offsets
collapse to a static set and every kernel is a *shifted block product* —

    y[i] = Σ_d data[d, i] @ x[i + off_d]     (no gathers, no scatters).

A structural ``mask[d][i]`` keeps band-fill out of the ILU/GS pattern exactly
as in the scalar DIA form.

Layout — structure-of-arrays component streams.  ``data`` is a tuple over
the k diagonals of *flat row-major component tuples*: ``data[d][i*bs + j]``
is the (nbrows,) stream of block entry (i, j) on diagonal d.  Two measured
reasons (real v5e, nb=262k, bs=4):

* a stacked ``(k, nb, bs, bs)`` array forces every per-diagonal read through
  a sublane-strided layout (cf. sparse/dia.py): the 7-diagonal block SpMV
  runs 0.559 ms stacked vs **0.162 ms** as component streams (775 GB/s);
* the ``(nb,4,4)`` batched einsum/`jnp.linalg.inv` forms burn ~97 % of the
  MXU tile on padding (3.65 ms / 308 ms vs 0.018 ms / 0.17 ms as unrolled
  lane-parallel FMAs over streams — see precond/bdia_ilu0.py).

Block vectors stay ``(nbrows, bs)`` at API boundaries; kernels split them
into bs column streams and stack once at the end (ops/bdia.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .bsr import BSRMatrix

__all__ = ["BlockDiaMatrix", "bdia_from_bsr", "try_bdia_from_bsr",
           "bdia_pad_identity",
           "soa_block", "aos_block", "as_bdia_soa"]


def soa_block(stacked: jax.Array) -> tuple:
    """(nb, bs, bs) → flat row-major tuple of bs² (nb,) component streams."""
    bs = stacked.shape[-1]
    return tuple(stacked[:, i, j] for i in range(bs) for j in range(bs))


def aos_block(comp, bs: int) -> jax.Array:
    """Flat component tuple → materialised (nb, bs, bs) array."""
    return jnp.stack(list(comp), axis=0).reshape(bs, bs, -1).transpose(2, 0, 1)


def as_bdia_soa(data, k: int, bs: int) -> tuple:
    """Normalise a block-diagonal value operand to the SoA nested-tuple form.
    Accepts the SoA form itself, a stacked ``(k, nb, bs, bs)`` array, or an
    ``(k, bs², nb)`` component-major array (``np.asarray`` of the SoA form).

    A 3-D operand is ALWAYS interpreted component-major ``(k, bs², nb)`` —
    a block-row-major ``(k, nb, bs²)`` array is not accepted (when
    ``nb == bs²`` the two are indistinguishable by shape; pass the 4-D or
    tuple form for that layout)."""
    if isinstance(data, (tuple, list)):
        return tuple(tuple(c for c in comp) for comp in data)
    data = jnp.asarray(data)
    if data.ndim == 4:
        return tuple(soa_block(data[d]) for d in range(k))
    if data.ndim == 3 and data.shape[1] == bs * bs:
        return tuple(tuple(data[d, c] for c in range(bs * bs))
                     for d in range(k))
    raise ValueError(f"cannot interpret block-DIA values of shape {data.shape}")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockDiaMatrix:
    """Block-diagonal-format sparse matrix with a structural mask."""

    data: tuple                    # k × (bs² × (nbrows,)) component streams
    mask: tuple                    # k × (nbrows,) bool
    offsets: tuple = field(metadata=dict(static=True))
    # Host-computed "main-diagonal mask is all-True" flag, carried as STATIC
    # pytree metadata so jitted/vmapped/shard-mapped setups (the distributed
    # path) can still take the Pallas stencil factor route — a traced mask
    # cannot be inspected at trace time (VERDICT r4 #5).  None = unknown
    # (resolved lazily on concrete masks by resolved_diag_mask_full).
    diag_mask_full: bool | None = field(default=None,
                                        metadata=dict(static=True))

    @property
    def nbrows(self) -> int:
        return self.data[0][0].shape[0]

    @property
    def bs(self) -> int:
        bs = int(round(len(self.data[0]) ** 0.5))
        if bs * bs != len(self.data[0]):
            raise ValueError(
                f"malformed component tuple: {len(self.data[0])} streams is "
                f"not a square block size")
        return bs

    @property
    def nrows(self) -> int:
        return self.nbrows * self.bs

    @property
    def ndiags(self) -> int:
        return len(self.data)

    @property
    def dtype(self):
        return self.data[0][0].dtype

    @property
    def diag_blocks(self) -> jax.Array:
        """Materialised (nbrows, bs, bs) diagonal blocks (setup-time use)."""
        return aos_block(self.data[self.offsets.index(0)], self.bs)

    def block(self, d: int) -> jax.Array:
        """Materialised (nbrows, bs, bs) blocks of diagonal ``d``."""
        return aos_block(self.data[d], self.bs)

    @property
    def vals_pad(self) -> tuple:
        """Kernel value operand (SoA streams here; see DiaMatrix.vals_pad)."""
        return self.data

    def stacked_spmv_coeffs(self) -> jax.Array:
        """The stencil SpMV kernel's (~k·bs², nbrows) stacked coefficient
        layout, cached on the container for concrete values so Krylov
        loops calling ``bdia_spmv`` repeatedly do not re-materialise a
        second full copy of the matrix data per call (ADVICE r4).  Traced
        values (inside jit) are never cached — XLA hoists the stack out of
        loop bodies there."""
        from ..ops.bstencil import stack_spmv_coeffs

        c = getattr(self, "_spmv_stack_cache", None)
        if c is not None:
            return c
        C = stack_spmv_coeffs(self.offsets, self.data, self.bs)
        if not isinstance(C, jax.core.Tracer):
            object.__setattr__(self, "_spmv_stack_cache", C)
        return C

    def resolved_diag_mask_full(self) -> bool | None:
        """The static flag if carried, else a host check of the concrete
        main-diagonal mask (None when the mask is traced)."""
        if self.diag_mask_full is not None:
            return self.diag_mask_full
        try:
            return bool(np.asarray(self.mask[self.offsets.index(0)]).all())
        except jax.errors.TracerArrayConversionError:
            return None

    def with_new_data(self, data) -> "BlockDiaMatrix":
        """Same band structure, new values (masked to the structural
        pattern) — the value-update path (see :meth:`DiaMatrix.with_new_data`).
        Accepts the SoA form or a stacked ``(k, nbrows, bs, bs)`` array."""
        data = as_bdia_soa(data, self.ndiags, self.bs)
        data = tuple(
            tuple(jnp.where(m, jnp.asarray(c), 0.0) for c in comp)
            for m, comp in zip(self.mask, data))
        return BlockDiaMatrix(data=data, mask=self.mask, offsets=self.offsets,
                              diag_mask_full=self.diag_mask_full)

    def to_scipy(self):
        import scipy.sparse as sps

        nb, bs = self.nbrows, self.bs
        rows, cols, vals = [], [], []
        for d, o in enumerate(self.offsets):
            i = np.nonzero(np.asarray(self.mask[d]))[0]
            for ib in range(bs):
                for jb in range(bs):
                    rows.append(i * bs + ib)
                    cols.append((i + o) * bs + jb)
                    vals.append(np.asarray(self.data[d][ib * bs + jb])[i])
        return sps.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(nb * bs, nb * bs)).tocsr()


def bdia_pad_identity(A: BlockDiaMatrix, nb_pad: int) -> BlockDiaMatrix:
    """Append decoupled identity block-rows (uneven-row-partition support;
    cf. sparse.dia.dia_pad_identity)."""
    nb = A.nbrows
    if nb_pad == nb:
        return A
    bs = A.bs
    d0 = A.offsets.index(0)
    extra = nb_pad - nb

    def ext(c, val):
        return jnp.concatenate([c, jnp.full(extra, val, c.dtype)])

    data = tuple(
        tuple(ext(comp[i * bs + j],
                  1.0 if (d == d0 and i == j) else 0.0)
              for i in range(bs) for j in range(bs))
        for d, comp in enumerate(A.data))
    mask = tuple(jnp.concatenate([m, jnp.full(extra, d == d0)])
                 for d, m in enumerate(A.mask))
    # identity rows extend the main diagonal with True entries, so the
    # static full-diagonal flag is preserved
    return BlockDiaMatrix(data=data, mask=mask, offsets=A.offsets,
                          diag_mask_full=A.diag_mask_full)


def block_pattern_csr(A: BlockDiaMatrix):
    """Block-granularity sparsity pattern as (indptr, indices) — for level
    scheduling and other symbolic passes."""
    import scipy.sparse as sps

    nb = A.nbrows
    rows, cols = [], []
    for d, o in enumerate(A.offsets):
        i = np.nonzero(np.asarray(A.mask[d]))[0]
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
    d0 = int(np.searchsorted(uniq, 0)) if 0 in dmap else -1
    return BlockDiaMatrix(
        data=tuple(tuple(jnp.asarray(data[d, :, i, j])
                         for i in range(bs) for j in range(bs))
                   for d in range(k)),
        mask=tuple(jnp.asarray(mask[d]) for d in range(k)),
        offsets=tuple(int(o) for o in uniq),
        diag_mask_full=bool(mask[d0].all()) if d0 >= 0 else False)


def try_bdia_from_bsr(B: BSRMatrix, max_diags: int = 32) -> BlockDiaMatrix | None:
    rowptr = np.asarray(B.rowptr)
    colind = np.asarray(B.colind)
    nb = B.nbrows
    rows = np.repeat(np.arange(nb), np.diff(rowptr))
    offs = np.unique(colind.astype(np.int64) - rows)
    if offs.shape[0] > max_diags:
        return None
    return bdia_from_bsr(B)
