"""Multi-device distribution: row sharding, halo exchange, local precs."""

from .dist import (
    DistributedSolver,
    LocalBlockPreconditioner,
    dist_spmv,
    make_mesh,
    shard_dist_csr,
    shard_vector,
)
from .dist_mg import DistMGSolver
from .partition import DistCSR, partition_csr

__all__ = [
    "DistributedSolver", "DistMGSolver", "LocalBlockPreconditioner",
    "dist_spmv", "make_mesh", "shard_dist_csr", "shard_vector",
    "DistCSR", "partition_csr",
]
