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
from .partition import DistBSR, DistCSR, partition_bsr, partition_csr

__all__ = [
    "DistributedSolver", "DistMGSolver", "LocalBlockPreconditioner",
    "dist_spmv", "make_mesh", "shard_dist_csr", "shard_vector",
    "DistCSR", "DistBSR", "partition_csr", "partition_bsr",
]
