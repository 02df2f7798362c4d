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

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.bsr import BSRMatrix, PaddedBSR
from ..sparse.csr import CSRMatrix, PaddedCSR

__all__ = ["DistCSR", "DistBSR", "partition_csr", "partition_bsr",
           "build_ghost_plan"]


def build_ghost_plan(cols_pad: np.ndarray, n_units: int, nshards: int):
    """Ghost-index (compressed) halo-exchange plan for the unstructured
    distributed SpMV — the analogue of PETSc's VecScatter, which the
    reference inherits (reference: doc/user-doc.md:36; MatMult behind
    blasted_petsc.cpp:229-298): each shard receives only the off-shard x
    entries its rows actually reference, instead of an all-gather of x.

    ``cols_pad``: (n_units, W) global padded column indices, sentinel
    ``n_units``.  Returns ``(ghost_colind, sendidx, T)`` or ``None`` when the
    plan saves nothing (dense coupling):

    - ``ghost_colind`` (n_units, W) int32 — columns remapped to each owning
      shard's local frame: [0, nl) local entries, nl + src*T + slot for the
      ghost received from shard ``src``, sentinel nl + nshards*T (a zero);
    - ``sendidx`` (nshards, nshards, T) int32 — for source shard ``src``,
      row ``dst`` lists the local indices ``dst`` needs (0-padded; padding
      slots are sent but never referenced);
    - ``T`` — the per-(src,dst) halo width (max needed count, ≥ 1).

    Per-device exchange volume becomes nshards·T values — proportional to
    the halo, not to n.
    """
    nl = n_units // nshards
    need = {}                     # (src, dst) -> sorted local indices on src
    T = 1
    for dst in range(nshards):
        block = cols_pad[dst * nl:(dst + 1) * nl]
        off = np.unique(block[(block < n_units)
                              & ((block < dst * nl) | (block >= (dst + 1) * nl))])
        owners = off // nl
        for src in np.unique(owners):
            loc = off[owners == src] - src * nl
            need[(int(src), dst)] = loc
            T = max(T, len(loc))
    if nshards * T >= n_units:    # no traffic saving over all_gather
        return None

    sendidx = np.zeros((nshards, nshards, T), dtype=np.int32)
    for (src, dst), loc in need.items():
        sendidx[src, dst, :len(loc)] = loc

    ghost = np.full_like(cols_pad, nl + nshards * T)      # sentinel slot
    for dst in range(nshards):
        sl = slice(dst * nl, (dst + 1) * nl)
        block = cols_pad[sl]
        local = (block >= dst * nl) & (block < (dst + 1) * nl)
        out = ghost[sl]
        out[local] = block[local] - dst * nl
        stored = (block < n_units) & ~local
        owners = block[stored] // nl
        gcols = np.empty(stored.sum(), dtype=np.int64)
        for src in np.unique(owners):
            m = owners == src
            loc = need[(int(src), dst)]
            gcols[m] = nl + src * T + np.searchsorted(
                loc, block[stored][m] - src * nl)
        out[stored] = gcols
        ghost[sl] = out
    return ghost.astype(np.int32), sendidx, int(T)


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
    nshards: int = field(metadata=dict(static=True))
    # ghost-exchange plan (see build_ghost_plan); None → all_gather fallback
    ghost_colind: jax.Array | None = None    # (n, W) local-frame cols
    sendidx: jax.Array | None = None         # (nshards, nshards, T)
    ghost_width: int = field(default=0, metadata=dict(static=True))

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

    plan = build_ghost_plan(np.asarray(P.colind), n, nshards)
    gci, sidx, T = (None, None, 0) if plan is None else \
        (jnp.asarray(plan[0]), jnp.asarray(plan[1]), plan[2])
    return DistCSR(colind=P.colind, vals_pad=P.vals_pad,
                   local=stacked, nshards=nshards,
                   ghost_colind=gci, sendidx=sidx, ghost_width=T)


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
    nshards: int = field(metadata=dict(static=True))
    # ghost-exchange plan at block granularity (see build_ghost_plan)
    ghost_colind: jax.Array | None = None
    sendidx: jax.Array | None = None
    ghost_width: int = field(default=0, metadata=dict(static=True))

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

    plan = build_ghost_plan(np.asarray(P.colind), nb, nshards)
    gci, sidx, T = (None, None, 0) if plan is None else \
        (jnp.asarray(plan[0]), jnp.asarray(plan[1]), plan[2])
    return DistBSR(colind=P.colind, vals_pad=P.vals_pad,
                   local=stacked, nshards=nshards,
                   ghost_colind=gci, sendidx=sidx, ghost_width=T)
