"""blasted_tpu — a TPU-native sparse preconditioning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of BLASTed
(the reference C++/OpenMP library): sparse CSR/BSR containers, fixed-point
("asynchronous" in the reference) ILU(0)/SGS/Jacobi preconditioners and
relaxations, level-scheduled exact paths, sparse approximate inverses,
Krylov solvers, and multi-device row-partitioned distribution via
``jax.sharding`` + ``shard_map``.

The reference's chaotic shared-memory sweeps become synchronous data-parallel
sweeps here (same fixed-point mathematics, race-free, VPU/MXU-vectorised);
its MPI/PETSc domain decomposition becomes mesh-sharded SpMV with ICI
collectives around local (per-shard) preconditioners.
"""

from . import apps, config, ops, precond, solvers, sparse
from .factory import (
    create_preconditioner,
    create_preconditioner_from_string,
    to_device_matrix,
)
from .config import (
    SEQUENTIAL,
    ApplyInit,
    AsyncSolverSettings,
    FactInit,
    PrecType,
    SolverSettings,
)
from .sparse import (
    BSRMatrix,
    COOMatrix,
    CSRMatrix,
    PaddedBSR,
    PaddedCSR,
    bsr_from_coo,
    csr_from_coo,
    read_matrix_market,
    read_matrix_market_vector,
)

__version__ = "0.1.0"

__all__ = [
    "apps", "config", "ops", "precond", "solvers", "sparse",
    "create_preconditioner", "create_preconditioner_from_string",
    "to_device_matrix",
    "SEQUENTIAL", "ApplyInit", "AsyncSolverSettings", "FactInit", "PrecType",
    "SolverSettings",
    "BSRMatrix", "COOMatrix", "CSRMatrix", "PaddedBSR", "PaddedCSR",
    "bsr_from_coo", "csr_from_coo",
    "read_matrix_market", "read_matrix_market_vector",
]
