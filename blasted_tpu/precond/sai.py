"""Sparse approximate inverse (SAI / ISAI) preconditioner.

Equivalent of the reference's SAI machinery (reference: src/sai.cpp —
``left_SAI_pattern`` :12-190, ``left_incomplete_SAI_pattern`` :200-280,
``compute_SAI`` :301-326) promoted from the reference's stub operator status
(solverops_sai.cpp:24-33) to a full preconditioner, as planned in SURVEY.md §7.8.

Left SAI: M has the sparsity of A and minimises ‖M A − I‖_F row-wise.  For
row i the variables are m_ij, j ∈ pattern(i); the equations run over
c ∈ ∪_{j∈pattern(i)} pattern(j):   Σ_j A_jc · m_ij = δ_ic, i.e. the LS matrix
is LHS[c,j] = A_jc (the reference gathers the transposed blocks,
sai.cpp:337-368).  ISAI restricts the equations to c ∈ pattern(i), giving a
square system (reference: partialPivLu vs colPivHouseholderQr, sai.cpp:319-322).

TPU-native computation: every row's problem is padded to a common
(nEqns, nVars) shape and solved as ONE batched dense solve on the MXU —
normal equations G = LHSᵀLHS (+ identity on padded variables), Cholesky-free
``jnp.linalg.solve``.  The apply is a plain SpMV with the SAI values — the
most TPU-friendly preconditioner in the suite.

This scalar implementation covers CSR; the pattern builder is fully
vectorised NumPy (boolean sparse product for the equation sets + one global
searchsorted for all gather positions).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.csr import PaddedCSR, extend_zero
from .base import Preconditioner, PrecInfo
from .ilu_pattern import rows_of_nnz

__all__ = ["SAIPreconditioner", "BlockSAIPreconditioner"]


class _SAISymbolic(NamedTuple):
    lhs_pos: jax.Array      # (n, E, V) int32 — pos of A[j_v, c_e] in nnz, sentinel nnz
    var_pad: jax.Array      # (n, V) bool — padded variable slots
    central: jax.Array      # (n,) int32 — equation index of column i
    nnz: int


def _flat_csr(P: PaddedCSR):
    rowptr = np.asarray(P.rowptr)
    nnz = int(np.asarray(P.nnz_total))
    pos = np.asarray(P.pos)
    cols = np.asarray(P.colind)
    colind = np.zeros(nnz, dtype=np.int64)
    valid = pos < nnz
    colind[pos[valid]] = cols[valid]
    return rowptr.astype(np.int64), colind, nnz


def _build_sai_symbolic(P: PaddedCSR, incomplete: bool) -> _SAISymbolic:
    import scipy.sparse as sps

    rowptr, colind, nnz = _flat_csr(P)
    n = rowptr.shape[0] - 1
    rownnz = np.diff(rowptr)
    V = int(rownnz.max())

    Abool = sps.csr_matrix(
        (np.ones(nnz, dtype=np.int8), colind, rowptr), shape=(n, n))
    if incomplete:
        E_mat = Abool                       # equations = pattern(i)
    else:
        E_mat = (Abool @ Abool).tocsr()     # ∪_j pattern(j), j ∈ pattern(i)
        E_mat.sort_indices()
    eq_ptr = E_mat.indptr.astype(np.int64)
    eq_col = E_mat.indices.astype(np.int64)
    eqnnz = np.diff(eq_ptr)
    E = int(eqnnz.max())

    # padded equation-column table (n, E), sentinel n
    eq_tab = np.full((n, E), n, dtype=np.int64)
    slot = np.arange(E)[None, :]
    validE = slot < eqnnz[:, None]
    eq_tab[validE] = eq_col[(eq_ptr[:-1][:, None] + slot)[validE]]

    # padded variable table (n, V): columns j of row i, sentinel n
    var_tab = np.full((n, V), n, dtype=np.int64)
    slotV = np.arange(V)[None, :]
    validV = slotV < rownnz[:, None]
    var_tab[validV] = colind[(rowptr[:-1][:, None] + slotV)[validV]]

    # central equation: position of column i in row i's equation list
    central = np.zeros(n, dtype=np.int64)
    for_field = eq_tab == np.arange(n)[:, None]
    central = np.argmax(for_field, axis=1)

    # gather positions of A[j, c] for every (eqn e, var v) pair per row
    j = np.broadcast_to(var_tab[:, None, :], (n, E, V))
    c = np.broadcast_to(eq_tab[:, :, None], (n, E, V))
    key_all = rows_of_nnz(rowptr).astype(np.int64) * n + colind
    keys = j * n + c
    valid = (j < n) & (c < n)
    pos = np.full((n, E, V), nnz, dtype=np.int64)
    q = np.searchsorted(key_all, keys[valid])
    ok = (q < nnz) & (key_all[np.minimum(q, nnz - 1)] == keys[valid])
    vv = pos[valid]
    vv[ok] = q[ok]
    pos[valid] = vv

    return _SAISymbolic(
        lhs_pos=jnp.asarray(pos.astype(np.int32)),
        var_pad=jnp.asarray(~validV),
        central=jnp.asarray(central.astype(np.int32)),
        nnz=nnz,
    )


class _SAIState(NamedTuple):
    sai_pad: jax.Array  # (n, W) SAI values in the padded row layout


class SAIPreconditioner(Preconditioner):
    """Left SAI/ISAI with the sparsity of A; apply = SpMV with M."""

    def __init__(self, mat: PaddedCSR, incomplete: bool = False):
        super().__init__(mat)
        self.incomplete = incomplete
        self.symbolic: _SAISymbolic | None = None
        self._vals = None

    def _ensure_symbolic(self):
        """Pattern computed once; values re-read from the current matrix on
        every compute() (the value-update workflow, precond/base.py)."""
        if self.symbolic is None:
            self.symbolic = _build_sai_symbolic(self.mat, self.incomplete)
        self._vals = self.mat.flat_vals()

    def compute(self) -> PrecInfo:
        self._ensure_symbolic()
        sym = self.symbolic
        ext = extend_zero(self._vals)
        lhs = ext[sym.lhs_pos]                       # (n, E, V)
        n, E, V = lhs.shape
        dt = lhs.dtype
        # normal equations with identity on padded variables
        G = jnp.einsum("nev,new->nvw", lhs, lhs, preferred_element_type=dt)
        G = G + jnp.where(sym.var_pad, 1.0, 0.0)[:, :, None] * jnp.eye(V, dtype=dt)
        # b = LHSᵀ e_central  →  row `central` of LHS
        b = jnp.take_along_axis(lhs, sym.central[:, None, None], axis=1)[:, 0, :]
        m = jnp.linalg.solve(G, b[..., None])[..., 0]   # (n, V)
        m = jnp.where(sym.var_pad, 0.0, m)
        # scatter the solution into the padded row layout (M has A's pattern)
        flat = jnp.zeros((sym.nnz + 1,), dt).at[self.mat.pos[:, :V]].set(m)
        self.state = _SAIState(sai_pad=flat[self.mat.pos])
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        rg = mat.gather_x(r)
        return jnp.sum(state.sai_pad * rg, axis=1)

    def apply_relax(self, b, x):
        raise NotImplementedError("SAI relaxation not implemented")


class BlockSAIPreconditioner(Preconditioner):
    """Block left SAI/ISAI (reference: compute_SAI instantiated for bs=1,4,
    sai.cpp:328-335): per block-row least-squares with bs right-hand sides —
    LHS[c·bs:…, j·bs:…] = (A_jc)ᵀ (the transposed-block gather of
    sai.cpp:337-368), RHS = the bs columns of the identity at the central
    block-row.  Solved as one batched normal-equations system of size
    (nVars·bs) per block row; apply = block SpMV with M."""

    def __init__(self, mat, incomplete: bool = False):
        super().__init__(mat)
        self.incomplete = incomplete
        self.symbolic: _SAISymbolic | None = None
        self._vals = None

    def _ensure_symbolic(self):
        """See :meth:`SAIPreconditioner._ensure_symbolic`."""
        if self.symbolic is None:
            self.symbolic = _build_sai_symbolic(self.mat, self.incomplete)
        self._vals = self.mat.flat_vals()

    def compute(self) -> PrecInfo:
        self._ensure_symbolic()
        sym = self.symbolic
        bs = self.mat.bs
        ext = jnp.concatenate(
            [self._vals, jnp.zeros((1, bs, bs), self._vals.dtype)])
        blk = ext[sym.lhs_pos]                      # (n, E, V, bs, bs) = A[j,c]
        n, E, V = sym.lhs_pos.shape
        dt = blk.dtype
        # scalar LHS rows are (c, ib), cols are (j, jb): LHS = A_jcᵀ per block
        lhs = jnp.transpose(blk, (0, 1, 4, 2, 3)).reshape(n, E * bs, V * bs)
        G = jnp.einsum("nev,new->nvw", lhs, lhs, preferred_element_type=dt)
        pad = jnp.repeat(sym.var_pad, bs, axis=1)   # (n, V*bs)
        G = G + pad[:, :, None] * jnp.eye(V * bs, dtype=dt)
        # B = LHSᵀ E_central: rows c==central give (A_i,central? no: A at
        # (j, c=i)) → gather the central equation's block rows
        central_rows = jnp.take_along_axis(
            lhs.reshape(n, E, bs, V * bs),
            sym.central[:, None, None, None], axis=1)[:, 0]   # (n, bs, V*bs)
        B = jnp.swapaxes(central_rows, 1, 2)        # (n, V*bs, bs)
        m = jnp.linalg.solve(G, B)                  # (n, V*bs, bs)
        m = jnp.where(pad[:, :, None], 0.0, m)
        # m[(j,jb), ib] = M_i[ib? ...]: solution column ib gives row i·bs+ib of
        # M; M block (i,j)[ib, jb] = m[j·bs+jb, ib]
        mblk = jnp.transpose(m.reshape(n, V, bs, bs), (0, 1, 3, 2))  # (n,V,bs,bs)
        flat = jnp.zeros((sym.nnz + 1, bs, bs), dt).at[self.mat.pos[:, :V]].set(mblk)
        self.state = _SAIState(sai_pad=flat[self.mat.pos])
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        """r is (nbrows, bs); z = M r via block SpMV."""
        rg = mat.gather_x(r)                        # (n, W, bs)
        return jnp.einsum("rwij,rwj->ri", state.sai_pad, rg,
                          preferred_element_type=r.dtype)

    def apply_relax(self, b, x):
        raise NotImplementedError("SAI relaxation not implemented")
