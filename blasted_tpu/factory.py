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


def create_preconditioner(mat, settings: SolverSettings) -> Preconditioner:
    """(reference: SRFactory::create_preconditioner, solverfactory.cpp:129-230)"""
    P = _padded(mat)
    is_block = isinstance(P, (PaddedBSR, BlockDiaMatrix))
    t = settings.prec_type
    s = settings if isinstance(settings, AsyncSolverSettings) \
        else AsyncSolverSettings(prec_type=t)

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
                fact_init=s.fact_init, apply_init=s.apply_init)
        if is_block:
            return BlockILU0Preconditioner(
                P, nbuildsweeps=nbuild, napplysweeps=napply,
                use_scaling=s.use_symmetric_scaling,
                fact_init=s.fact_init, apply_init=s.apply_init)
        if isinstance(P, DiaMatrix):
            from .precond.dia_ilu0 import DiaILU0Preconditioner
            return DiaILU0Preconditioner(
                P, nbuildsweeps=nbuild, napplysweeps=napply,
                use_scaling=s.use_symmetric_scaling,
                fact_init=s.fact_init, apply_init=s.apply_init)
        return ILU0Preconditioner(
            P, nbuildsweeps=nbuild, napplysweeps=napply,
            use_scaling=s.use_symmetric_scaling,
            fact_init=s.fact_init, apply_init=s.apply_init,
            compute_precinfo=s.compute_precinfo)

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
