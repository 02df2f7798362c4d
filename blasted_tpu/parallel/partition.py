"""Host-side row partitioning for multi-device distribution.

The reference inherits its distribution from PETSc: the matrix is partitioned
row-wise across MPI ranks, the global Krylov/SpMV (with halo exchange) lives
outside, and each rank's preconditioner sees only the *local diagonal block*
with zero communication during apply (reference: blasted_petsc.cpp:229-298,
doc/user-doc.md:36; SURVEY.md §2.5 P8).

TPU-native re-expression: rows are sharded over a 1-D ``jax.sharding.Mesh``
axis.  This module computes, per shard,

- the row-partitioned global padded arrays (for the distributed SpMV — global
  column indices; XLA or explicit collectives resolve off-shard gathers), and
- the *local diagonal block* of each shard as uniformly-padded ``PaddedCSR``
  arrays stacked on a leading shard axis (for shard-local preconditioners).

All shards are padded to identical shapes so the stacked arrays map onto the
mesh with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.bsr import BSRMatrix, PaddedBSR
from ..sparse.csr import CSRMatrix, PaddedCSR

__all__ = ["DistCSR", "DistBSR", "partition_csr", "partition_bsr"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistCSR:
    """Row-partitioned CSR in device form.

    ``colind``/``pos`` keep *global* column indices for the SpMV path.
    ``local`` is a PaddedCSR whose arrays carry a leading shard axis
    (nshards, ...) describing each shard's diagonal block with *local*
    column indices — the bjacobi-semantics view.
    """

    # global row-sharded view (shapes (n, W) etc., shard along axis 0)
    colind: jax.Array     # (n, W) global cols, sentinel n
    vals_pad: jax.Array   # (n, W)
    # stacked local diagonal blocks (leading shard axis)
    local: PaddedCSR      # arrays shaped (nshards, nl, Wl) / (nshards, nl)
    nshards: int

    @property
    def nrows(self) -> int:
        return self.colind.shape[0]

    @property
    def rows_per_shard(self) -> int:
        return self.colind.shape[0] // self.nshards


def _pad_local_block(A: CSRMatrix, lo: int, hi: int, width: int):
    """Extract rows [lo,hi) restricted to columns [lo,hi) as local-index
    padded arrays (the shard's diagonal block)."""
    import scipy.sparse as sps

    sp = A.to_scipy()[lo:hi, lo:hi].tocsr()
    sp.sort_indices()
    # ensure a full diagonal (bjacobi blocks of our matrices always have one)
    sub = CSRMatrix.from_scipy(sp)
    return sub.pad(width)


def partition_csr(A: CSRMatrix, nshards: int) -> DistCSR:
    n = A.nrows
    if n % nshards:
        raise ValueError(f"nrows {n} not divisible by nshards {nshards}")
    nl = n // nshards
    P = A.pad()

    # local diagonal blocks, padded to a common width
    import scipy.sparse as sps

    sp = A.to_scipy()
    Wl = 0
    for d in range(nshards):
        lo, hi = d * nl, (d + 1) * nl
        blk = sp[lo:hi, lo:hi].tocsr()
        Wl = max(Wl, int(np.diff(blk.indptr).max()))

    locals_ = [_pad_local_block(A, d * nl, (d + 1) * nl, Wl)
               for d in range(nshards)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *locals_)

    return DistCSR(colind=P.colind, vals_pad=P.vals_pad,
                   local=stacked, nshards=nshards)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistBSR:
    """Row-partitioned BSR in device form — the block analogue of
    :class:`DistCSR` for the reference's bjacobi-over-BAIJ path
    (reference: blasted_petsc.cpp:278-298, bs ∈ {4,5} there; runtime shape
    here).  ``local`` is a PaddedBSR stacked on a leading shard axis whose
    column indices are shard-local (the diagonal block)."""

    colind: jax.Array     # (nbrows, W) global block cols, sentinel nbrows
    vals_pad: jax.Array   # (nbrows, W, bs, bs)
    local: PaddedBSR      # arrays shaped (nshards, nbl, Wl, ...) etc.
    nshards: int

    @property
    def nbrows(self) -> int:
        return self.colind.shape[0]

    @property
    def bs(self) -> int:
        return self.vals_pad.shape[-1]


def partition_bsr(B: BSRMatrix, nshards: int) -> DistBSR:
    """Block-row partition with per-shard diagonal blocks — the distributed
    unstructured-BSR path (reference: PETSc partitions BAIJ row-wise and each
    rank preconditions its diagonal block, blasted_petsc.cpp:281-298)."""
    nb = B.nbrows
    if nb % nshards:
        raise ValueError(f"nbrows {nb} not divisible by nshards {nshards}")
    nl = nb // nshards
    P = B.pad()

    rowptr = np.asarray(B.rowptr)
    colind = np.asarray(B.colind)
    vals = np.asarray(B.vals)
    rows = np.repeat(np.arange(nb), np.diff(rowptr))

    sels = []
    Wl = 1
    for d in range(nshards):
        lo, hi = d * nl, (d + 1) * nl
        sel = (rows >= lo) & (rows < hi) & (colind >= lo) & (colind < hi)
        cnt = np.bincount(rows[sel] - lo, minlength=nl)
        Wl = max(Wl, int(cnt.max()) if cnt.size else 1)
        sels.append(sel)

    locals_ = []
    for d in range(nshards):
        sel, lo = sels[d], d * nl
        lr = rows[sel] - lo
        rp = np.zeros(nl + 1, dtype=np.int32)
        np.add.at(rp[1:], lr, 1)
        rp = np.cumsum(rp, dtype=np.int32)
        sub = BSRMatrix.from_arrays(rp, (colind[sel] - lo).astype(np.int32),
                                    vals[sel], B.bs)
        locals_.append(sub.pad(Wl))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *locals_)

    return DistBSR(colind=P.colind, vals_pad=P.vals_pad,
                   local=stacked, nshards=nshards)
