"""Preconditioner / relaxation operators (reference layer L4)."""

from .base import NoPreconditioner, Preconditioner, PrecInfo, SolveParams
from .ilu0 import BlockILU0Preconditioner, ILU0Preconditioner
from .inner import InnerKrylovPreconditioner
from .multigrid import AMGSettings, MultigridPreconditioner
from .ilu_pattern import ILUPositions, compute_ilu_positions, pad_ilu_positions
from .jacobi import BJacobiPreconditioner, JacobiPreconditioner
from .level_sgs import (
    BlockLevelSGSPreconditioner,
    CSCBGSPreconditioner,
    LevelSGSPreconditioner,
)
from .levels import compute_levels_lower, compute_levels_upper
from .sgs import (
    BlockChaoticRelaxation,
    BSGSPreconditioner,
    ChaoticRelaxation,
    SGSPreconditioner,
)

__all__ = [
    "InnerKrylovPreconditioner",
    "AMGSettings", "MultigridPreconditioner",
    "NoPreconditioner", "Preconditioner", "PrecInfo", "SolveParams",
    "JacobiPreconditioner", "BJacobiPreconditioner",
    "SGSPreconditioner", "BSGSPreconditioner",
    "ChaoticRelaxation", "BlockChaoticRelaxation",
    "ILU0Preconditioner", "BlockILU0Preconditioner",
    "LevelSGSPreconditioner", "BlockLevelSGSPreconditioner",
    "CSCBGSPreconditioner",
    "ILUPositions", "compute_ilu_positions", "pad_ilu_positions",
    "compute_levels_lower", "compute_levels_upper",
]
