"""Symbolic ILU(0) position lists — host-side, fully vectorised.

Equivalent of the reference's ``compute_ILU_positions_CSR_CSR``
(reference: src/ilu_pattern.cpp:31-163, include/ilu_pattern.hpp:35-52): for
every stored nonzero a_ic, the list of (L-position, U-position) pairs whose
products appear in the Chow–Patel fixed-point update

    lower (i>c):  l_ic = (a_ic − Σ_k l_ik u_kc) / u_cc
    upper (i<=c): u_ic =  a_ic − Σ_k l_ik u_kc        with k < min(i, c).

The reference builds these with nested per-row searches; here the whole pair
set is characterised as  {(i,k) ∈ strict-lower} × {(k,c) ∈ strict-upper}
restricted to the pattern of A, and constructed with NumPy repeat/searchsorted
tricks in O(total candidates) — no Python-level per-row loops.

The device form pads each nonzero's pair list to the maximum length with the
sentinel position ``nnz`` so gathered products read 0 (see sparse.csr).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["ILUPositions", "compute_ilu_positions", "PaddedILUPositions",
           "pad_ilu_positions", "rows_of_nnz", "FactSlots", "compute_fact_slots"]


@dataclass
class ILUPositions:
    """CSR-like pair lists (reference: include/ilu_pattern.hpp:35-52)."""

    posptr: np.ndarray  # (nnz+1,) int — start of each nonzero's pair list
    lowerp: np.ndarray  # (npairs,) int — position of l_ik in the nnz array
    upperp: np.ndarray  # (npairs,) int — position of u_kc in the nnz array


def rows_of_nnz(rowptr: np.ndarray) -> np.ndarray:
    """Row index of every stored nonzero."""
    n = rowptr.shape[0] - 1
    return np.repeat(np.arange(n, dtype=np.int32), np.diff(rowptr))


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    counts = np.asarray(counts, dtype=np.int64)
    if counts.size == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(starts, counts)


def compute_ilu_positions(rowptr, colind, diagind) -> ILUPositions:
    rowptr = np.asarray(rowptr, dtype=np.int64)
    colind = np.asarray(colind, dtype=np.int64)
    diagind = np.asarray(diagind, dtype=np.int64)
    n = rowptr.shape[0] - 1
    nnz = colind.shape[0]
    rows = rows_of_nnz(rowptr).astype(np.int64)

    # strictly-lower entries e: (i_e, k_e) at position posL_e
    lower_e = np.nonzero(colind < rows)[0]
    i_e = rows[lower_e]
    k_e = colind[lower_e]

    # expand each lower entry by the strict-upper segment of row k_e
    u_start = diagind + 1
    u_len = rowptr[1:] - u_start                 # strict-upper length per row
    cnt = u_len[k_e]
    posL = np.repeat(lower_e, cnt)
    i_c = np.repeat(i_e, cnt)
    posU = np.repeat(u_start[k_e], cnt) + _grouped_arange(cnt)
    c_c = colind[posU]

    # membership test: (i_c, c_c) must be a stored nonzero of A.
    # Composite keys are strictly increasing over the nnz array (rows ascend,
    # cols sorted within rows), so one global searchsorted resolves positions.
    key_all = rows * n + colind
    key_q = i_c * n + c_c
    j = np.searchsorted(key_all, key_q)
    ok = (j < nnz) & (key_all[np.minimum(j, nnz - 1)] == key_q)

    j, posL, posU = j[ok], posL[ok], posU[ok]

    # group by target nonzero j; stable sort keeps k ascending within a group
    order = np.argsort(j, kind="stable")
    j, posL, posU = j[order], posL[order], posU[order]
    counts = np.bincount(j, minlength=nnz)
    posptr = np.zeros(nnz + 1, dtype=np.int64)
    np.cumsum(counts, out=posptr[1:])
    return ILUPositions(posptr=posptr,
                        lowerp=posL.astype(np.int32),
                        upperp=posU.astype(np.int32))


@dataclass
class PaddedILUPositions:
    """Fixed-width device form: pair lists padded with the sentinel ``nnz``."""

    lowerp: np.ndarray  # (nnz, P) int32, sentinel nnz
    upperp: np.ndarray  # (nnz, P) int32, sentinel nnz
    maxpairs: int


def pad_ilu_positions(pos: ILUPositions, nnz: int) -> PaddedILUPositions:
    counts = np.diff(pos.posptr)
    P = max(int(counts.max()) if counts.size else 0, 1)
    lower = np.full((nnz, P), nnz, dtype=np.int32)
    upper = np.full((nnz, P), nnz, dtype=np.int32)
    slot = np.arange(P)[None, :]
    valid = slot < counts[:, None]
    flat = pos.posptr[:-1][:, None] + slot
    lower[valid] = pos.lowerp[flat[valid]]
    upper[valid] = pos.upperp[flat[valid]]
    return PaddedILUPositions(lowerp=lower, upperp=upper, maxpairs=P)


@dataclass
class FactSlots:
    """Exact per-nonzero factorization schedule (host-side).

    Refines the reference's row-wavefront levels (levelschedule.cpp) to
    *entry* granularity: within a row-level, a row's strictly-lower entries
    form a chain in column order (l_ic reads l_ik, k<c), and its upper
    entries depend on all of the row's lower entries.  The slot of entry j is

        slot[j] = offset[rowlevel[j]] + (lower-rank(j) if lower
                                         else nlower(row(j)))

    with per-level widths max(inner)+1.  Processing slots in order and
    updating each entry exactly once reproduces the sequential IKJ ILU(0)
    bit-for-bit — with total device work Σ_slots pad(|slot|) instead of the
    masked whole-pattern sweeps' nlevels × max-chain × nnz.
    """

    order: np.ndarray   # (nnz + maxseg,) int32 — nnz ids sorted by slot,
    #                     padded with the sentinel id nnz
    starts: np.ndarray  # (nslots,) int32 — start of each slot in ``order``
    lens: np.ndarray    # (nslots,) int32
    nslots: int
    maxseg: int         # max entries in any slot


def compute_fact_slots(rowptr, colind, fact_level,
                       chunk_size: int = 0) -> FactSlots:
    """Entry-level exact ILU(0) schedule (see :class:`FactSlots`).

    ``chunk_size`` > 0 overrides the auto-fitted slot chunk width — the
    TPU re-expression of the reference's dynamic work-chunking knob
    (``thread_chunk_size``, reference: solverfactory.hpp:54,
    doc/user-doc.md:27; SURVEY.md §2.5 P6): it sets the granularity at
    which independent scheduled work is dispatched per scan step."""
    rowptr = np.asarray(rowptr, dtype=np.int64)
    colind = np.asarray(colind, dtype=np.int64)
    fact_level = np.asarray(fact_level, dtype=np.int64)
    nnz = colind.shape[0]
    rows = rows_of_nnz(rowptr).astype(np.int64)
    is_lower = colind < rows

    csum = np.concatenate([[0], np.cumsum(is_lower)])
    nlower_row = csum[rowptr[1:]] - csum[rowptr[:-1]]
    rank = csum[:nnz] - csum[rowptr[rows]]          # lower entries before j
    inner = np.where(is_lower, rank, nlower_row[rows])

    lev = fact_level[rows]
    nlev = int(fact_level.max()) + 1 if fact_level.size else 1
    maxinner = np.zeros(nlev, dtype=np.int64)
    np.maximum.at(maxinner, lev, inner)
    offset = np.concatenate([[0], np.cumsum(maxinner + 1)])
    slot = offset[lev] + inner
    nslots = int(offset[-1])

    order = np.argsort(slot, kind="stable").astype(np.int32)
    counts = np.bincount(slot, minlength=max(nslots, 1))
    starts = np.cumsum(counts) - counts

    # Entries within a slot are mutually independent, so a slot may be cut
    # into fixed-size chunks processed as separate scan steps: padding waste
    # drops from nslots×max(len) to ≤ nchunks×C.  C balances padding against
    # per-step dispatch overhead — pick the power of two minimizing
    # Σ ceil(len/C)·(C + F) with a small fixed-cost term (F≈16 elements).
    # Measured on the real TPU (v5e, f32): the slot scan factorizes
    # msc00726 in 95 ms (= 4.2 single gather-sweeps; the masked-full-sweep
    # exact form needs nfact×fact_inner = 5264 sweeps ≈ 119 s → ~1250×) and
    # RCM'd 2dcyl1 in 29 ms (≈ 3.0 sweeps; 296× vs masked).  The scan is
    # latency-bound per chunk, but the dominant traffic is the width-P pair
    # gathers — which any schedule shape pays — so slot-contiguous value
    # reordering would only shave the idx gather/scatter, not the pairs.
    lens = counts[counts > 0]
    sts = starts[counts > 0]
    if chunk_size > 0:
        best_c = int(chunk_size)
    else:
        best_c, best_cost = 1, np.inf
        for c in (16, 32, 64, 128, 256, 512, 1024):
            cost = np.sum(-(-lens // c)) * (c + 16)
            if cost < best_cost:
                best_c, best_cost = c, cost
    nch = -(-lens // best_c)
    off = _grouped_arange(nch) * best_c
    cstarts = np.repeat(sts, nch) + off
    clens = np.minimum(best_c, np.repeat(lens, nch) - off)
    if cstarts.size == 0:
        cstarts, clens = np.zeros(1, np.int64), np.zeros(1, np.int64)
    order = np.concatenate([order, np.full(best_c, nnz, dtype=np.int32)])
    return FactSlots(order=order,
                     starts=cstarts.astype(np.int32),
                     lens=clens.astype(np.int32),
                     nslots=len(cstarts), maxseg=best_c)
