"""String-keyed preconditioner factory (reference layer L5).

Equivalent of ``SRFactory::create_preconditioner``
(reference: src/solverfactory.cpp:129-230, include/solverfactory.hpp): maps a
:class:`~blasted_tpu.config.SolverSettings` to a concrete operator, handling
the scalar/block split by matrix type (the reference dispatches over
bs ∈ {1,4,5,...} × storage order at compile time; block size is a runtime
array shape here, one code path serves every bs).

The seq/sf/sap ILU variants (reference: solverfactory.cpp:93-107,
blasted_petsc.cpp:88-133) are sweep-count switches: ``SEQUENTIAL`` (−1)
selects the exact level-scheduled path for the corresponding phase.
"""

from __future__ import annotations

from .config import SEQUENTIAL, AsyncSolverSettings, PrecType, SolverSettings
from .precond import (
    BJacobiPreconditioner,
    BlockChaoticRelaxation,
    BlockILU0Preconditioner,
    BlockLevelSGSPreconditioner,
    BSGSPreconditioner,
    ChaoticRelaxation,
    CSCBGSPreconditioner,
    ILU0Preconditioner,
    JacobiPreconditioner,
    LevelSGSPreconditioner,
    NoPreconditioner,
    Preconditioner,
    SGSPreconditioner,
)
from .sparse.bdia import BlockDiaMatrix, try_bdia_from_bsr
from .sparse.bsr import BSRMatrix, PaddedBSR
from .sparse.csr import CSRMatrix, PaddedCSR
from .sparse.dia import DiaMatrix, try_dia_from_csr


def _padded(mat):
    if isinstance(mat, (CSRMatrix, BSRMatrix)):
        return mat.pad()
    return mat


def to_device_matrix(mat, prefer_dia: bool = True):
    """Pick the best device storage format: DIA for banded matrices (the
    gather-free fast path, sparse/dia.py), padded CSR/BSR otherwise."""
    if prefer_dia and isinstance(mat, CSRMatrix):
        d = try_dia_from_csr(mat)
        if d is not None:
            return d
    if prefer_dia and isinstance(mat, BSRMatrix):
        d = try_bdia_from_bsr(mat)
        if d is not None:
            return d
    return _padded(mat)


def rcm_banded_device_matrix(mat, max_diags: int = 128,
                             max_mem_ratio: float = 32.0):
    """Band an unstructured matrix into the DIA fast path via RCM.

    TPU gathers run ~200× slower than shifted streams (RESULTS.md), so even a
    sparse band with substantial zero-fill wins.  Returns
    ``(device_matrix, reordering)`` when RCM produces ≤ ``max_diags``
    (block-)diagonals with DIA storage ≤ ``max_mem_ratio`` × nnz, else
    ``(None, None)``.  The caller must permute vectors with the returned
    :class:`~blasted_tpu.precond.reordering.Reordering` (forward rows on the
    RHS, inverse columns on the solution).
    """
    import numpy as np

    from .precond.reordering import FORWARD, RCMReordering
    from .sparse.bdia import try_bdia_from_bsr as _try_b
    from .sparse.dia import try_dia_from_csr as _try_s

    if not isinstance(mat, (CSRMatrix, BSRMatrix)):
        return None, None
    r = RCMReordering()
    # RCM needs a symmetric pattern; compute on A + Aᵀ
    import scipy.sparse as sps

    if isinstance(mat, BSRMatrix):
        sp = sps.csr_matrix(
            (np.ones(mat.nnzb),
             np.asarray(mat.colind), np.asarray(mat.rowptr)),
            shape=(mat.nbrows, mat.nbrows))
    else:
        sp = mat.to_scipy()
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = np.asarray(reverse_cuthill_mckee((sp + sp.T).tocsr(),
                                            symmetric_mode=True),
                      dtype=np.int64)
    r.set_ordering(perm, perm)
    At = r.apply_to_matrix(mat, FORWARD)

    if isinstance(At, BSRMatrix):
        nnz_units = At.nnzb
        nrows_units = At.nbrows
        D = _try_b(At, max_diags=max_diags)
    else:
        nnz_units = At.nnz
        nrows_units = At.nrows
        D = _try_s(At, max_diags=max_diags)
    if D is None or D.ndiags * nrows_units > max_mem_ratio * nnz_units:
        return None, None
    return D, r


def create_preconditioner(mat, settings: SolverSettings) -> Preconditioner:
    """(reference: SRFactory::create_preconditioner, solverfactory.cpp:129-230)"""
    t = settings.prec_type
    s = settings if isinstance(settings, AsyncSolverSettings) \
        else AsyncSolverSettings(prec_type=t)

    if t == PrecType.AMG:         # needs the host container, not a padded form
        from .precond.multigrid import AMGSettings, MultigridPreconditioner
        if not isinstance(mat, (CSRMatrix, BSRMatrix)):
            raise ValueError("amg builds its hierarchy from the host "
                             "container; pass a CSRMatrix/BSRMatrix")
        if s.amg is not None:   # full -blasted_amg_* namespace (api.py)
            return MultigridPreconditioner(mat, s.amg)
        # ns=1 triangular sweeps have no Gauss-Seidel character (the first
        # Jacobi-on-triangular sweep from zero is just D^-1) and make a poor
        # smoother — measured 47 vs 12 outer iterations at 32^3; floor at 2.
        smoother = AsyncSolverSettings(
            prec_type=PrecType.SGS, napplysweeps=max(2, s.napplysweeps))
        return MultigridPreconditioner(mat, AMGSettings(smoother=smoother))

    P = _padded(mat)
    is_block = isinstance(P, (PaddedBSR, BlockDiaMatrix))

    if t == PrecType.NONE:
        return NoPreconditioner(P)

    if t == PrecType.JACOBI:
        return BJacobiPreconditioner(P) if is_block else JacobiPreconditioner(P)

    if t == PrecType.GS:
        cls = BlockChaoticRelaxation if is_block else ChaoticRelaxation
        return cls(P, napplysweeps=s.napplysweeps)

    if t == PrecType.SGS:
        cls = BSGSPreconditioner if is_block else SGSPreconditioner
        return cls(P, napplysweeps=s.napplysweeps, apply_init=s.apply_init)

    if t == PrecType.LEVEL_SGS:
        cls = BlockLevelSGSPreconditioner if is_block else LevelSGSPreconditioner
        return cls(P)

    if t == PrecType.CSC_BGS:
        if is_block:
            raise ValueError("cscbgs supports scalar matrices only "
                             "(matches reference instantiation)")
        return CSCBGSPreconditioner(P, napplysweeps=s.napplysweeps)

    if t in (PrecType.ILU0, PrecType.SEQILU0, PrecType.SFILU0,
             PrecType.SAPILU0, PrecType.ASYNC_LEVEL_ILU0):
        nbuild, napply = s.nbuildsweeps, s.napplysweeps
        if t in (PrecType.SEQILU0, PrecType.SFILU0):
            nbuild = SEQUENTIAL
        if t in (PrecType.SEQILU0, PrecType.SAPILU0, PrecType.ASYNC_LEVEL_ILU0):
            napply = SEQUENTIAL
        if isinstance(P, BlockDiaMatrix):
            from .precond.bdia_ilu0 import BlockDiaILU0Preconditioner
            return BlockDiaILU0Preconditioner(
                P, nbuildsweeps=nbuild, napplysweeps=napply,
                use_scaling=s.use_symmetric_scaling,
                fact_init=s.fact_init, apply_init=s.apply_init,
                apply_dtype=s.apply_dtype,
                compute_precinfo=s.compute_precinfo)
        if is_block:
            return BlockILU0Preconditioner(
                P, nbuildsweeps=nbuild, napplysweeps=napply,
                use_scaling=s.use_symmetric_scaling,
                fact_init=s.fact_init, apply_init=s.apply_init,
                compute_precinfo=s.compute_precinfo,
                thread_chunk_size=s.thread_chunk_size)
        if isinstance(P, DiaMatrix):
            from .precond.dia_ilu0 import DiaILU0Preconditioner
            return DiaILU0Preconditioner(
                P, nbuildsweeps=nbuild, napplysweeps=napply,
                use_scaling=s.use_symmetric_scaling,
                fact_init=s.fact_init, apply_init=s.apply_init,
                apply_dtype=s.apply_dtype,
                compute_precinfo=s.compute_precinfo)
        return ILU0Preconditioner(
            P, nbuildsweeps=nbuild, napplysweeps=napply,
            use_scaling=s.use_symmetric_scaling,
            fact_init=s.fact_init, apply_init=s.apply_init,
            compute_precinfo=s.compute_precinfo,
            thread_chunk_size=s.thread_chunk_size)

    if t in (PrecType.SAI, PrecType.ISAI):
        from .precond.sai import BlockSAIPreconditioner, SAIPreconditioner
        if isinstance(P, (DiaMatrix, BlockDiaMatrix)):
            raise ValueError("SAI requires padded-CSR/BSR storage; convert "
                             "with to_device_matrix(mat, prefer_dia=False)")
        if is_block:
            return BlockSAIPreconditioner(P, incomplete=(t == PrecType.ISAI))
        return SAIPreconditioner(P, incomplete=(t == PrecType.ISAI))

    raise ValueError(f"Unknown preconditioner type: {t}")


def create_preconditioner_from_string(mat, name: str, **kwargs) -> Preconditioner:
    """Convenience string entry point (reference: solverTypeFromString,
    solverfactory.cpp:35-64)."""
    settings = AsyncSolverSettings(prec_type=PrecType(name), **kwargs)
    return create_preconditioner(mat, settings)
