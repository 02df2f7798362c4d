"""Runtime configuration: enums and settings dataclasses.

TPU-native re-expression of the reference's solver configuration layer:
- ``BlastedSolverType`` enum      (reference: include/solvertypes.h:14-26)
- ``FactInit`` / ``ApplyInit``    (reference: include/async_initialization_decl.hpp:15-34)
- ``SolverSettings`` / ``AsyncSolverSettings`` (reference: include/solverfactory.hpp:46-68)

On TPU the asynchronous (chaotic) sweeps of the reference become *synchronous*
data-parallel Jacobi-style sweeps: one sweep = one whole-matrix update reading the
previous sweep's values.  ``sweeps = SEQUENTIAL`` (−1 in the reference,
src/blasted_petsc.cpp:88-133) selects the *exact* path, realised here by
level-scheduled wavefront updates instead of single-threaded execution.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class PrecType(enum.Enum):
    """Preconditioner/relaxation type (reference: include/solvertypes.h:14-26)."""

    NONE = "none"
    JACOBI = "jacobi"
    GS = "gs"                      # chaotic (forward) relaxation
    SGS = "sgs"                    # symmetric Gauss-Seidel, sweep-approximated
    ILU0 = "ilu0"                  # fixed-point ILU(0), sweep-approximated
    SEQILU0 = "seqilu0"            # exact factorize + exact apply
    SFILU0 = "sfilu0"              # exact ("sequential") factorize + sweep apply
    SAPILU0 = "sapilu0"            # sweep factorize + exact ("sequential") apply
    LEVEL_SGS = "level_sgs"        # level-scheduled exact SGS
    ASYNC_LEVEL_ILU0 = "async_level_ilu0"  # sweep factorize + level-scheduled apply
    CSC_BGS = "cscbgs"             # backward GS on the CSC transpose view
    SAI = "sai"                    # sparse approximate inverse (full LS)
    ISAI = "isai"                  # incomplete SAI
    AMG = "amg"                    # aggregation multigrid with blasted
                                   # smoothers per level (TPU addition; the
                                   # reference reaches MG via PETSc PCMG/GAMG,
                                   # blasted_petsc.cpp:610-630)


class FactInit(enum.Enum):
    """Initial guess for the fixed-point ILU factorization
    (reference: include/async_initialization_decl.hpp:15-24; note INIT_F_ZERO
    falls through to the original-matrix init in src/async_ilu_factor.cpp:47-54,
    which we reproduce by treating ZERO as ORIGINAL)."""

    ZERO = "init_zero"
    ORIGINAL = "init_original"
    SGS = "init_sgs"
    NONE = "init_none"


class ApplyInit(enum.Enum):
    """Initial guess for the sweep-based triangular solves
    (reference: include/async_initialization_decl.hpp:26-34)."""

    ZERO = "init_zero"
    JACOBI = "init_jacobi"
    NONE = "init_none"


#: Sentinel sweep count selecting the exact (level-scheduled) path.
#: Reference: BLASTED_SEQUENTIAL_SYMBOL == -1 (include/solvertypes.h:28).
SEQUENTIAL = -1


@dataclass(frozen=True)
class SolverSettings:
    """Base preconditioner settings (reference: include/solverfactory.hpp:46-56)."""

    prec_type: PrecType = PrecType.JACOBI
    block_size: int = 1
    relax_maxits: int = 1


@dataclass(frozen=True)
class AsyncSolverSettings(SolverSettings):
    """Settings for sweep-based ("asynchronous" in the reference) operators
    (reference: include/solverfactory.hpp:58-68).

    ``thread_chunk_size`` has no TPU meaning; its analogue is the Pallas tile
    size knob exposed per-kernel.  ``nbuildsweeps``/``napplysweeps`` == -1
    (:data:`SEQUENTIAL`) selects the exact level-scheduled path.
    """

    nbuildsweeps: int = 1
    napplysweeps: int = 1
    use_symmetric_scaling: bool = False
    fact_init: FactInit = FactInit.ORIGINAL
    apply_init: ApplyInit = ApplyInit.ZERO
    compute_precinfo: bool = False
    sai_pattern_power: int = 1
    # P6 (dynamic work chunking, reference: solverfactory.hpp:54): on TPU
    # this is the exact-ILU slot-schedule chunk width (ilu_pattern.
    # compute_fact_slots); 0 = auto-fit
    thread_chunk_size: int = 0
    # Mixed-precision apply (TPU-first): factor in the matrix dtype, store
    # the triangular-solve factors narrower (e.g. jnp.bfloat16).  None keeps
    # the matrix dtype.  Honoured by the DIA/block-DIA ILU operators.
    apply_dtype: object | None = None
    # populated (with a precond.multigrid.AMGSettings) only when
    # prec_type == AMG; kept untyped to avoid a config→multigrid import cycle
    amg: object | None = None


def parse_fact_init(name: str) -> FactInit:
    """String parser (reference: src/async_initialization_decl .. getFactInitFromString)."""
    return FactInit(name)


def parse_apply_init(name: str) -> ApplyInit:
    return ApplyInit(name)
