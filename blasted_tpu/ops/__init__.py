"""Compute kernels (reference layer L3): SpMV, BLAS-1, sweep primitives."""

from .blas1 import axpby, axpbypcz, dot, maxnorm, norm2
from .spmv import bgemv3, block_matvec, bspmv, gemv3, spmv
from .sweeps import (
    bgs_sweep,
    block_bgs_sweep,
    block_fgs_sweep,
    block_jacobi_sweep,
    block_lower_mv,
    block_unit_lower_sweep,
    block_upper_mv,
    block_upper_solve_sweep,
    fgs_sweep,
    invert_diag_blocks,
    jacobi_sweep,
    lower_mv,
    run_sweeps,
    unit_lower_sweep,
    upper_mv,
    upper_solve_sweep,
)

__all__ = [
    "axpby", "axpbypcz", "dot", "maxnorm", "norm2",
    "spmv", "gemv3", "bspmv", "bgemv3", "block_matvec",
    "lower_mv", "upper_mv", "fgs_sweep", "bgs_sweep", "jacobi_sweep",
    "unit_lower_sweep", "upper_solve_sweep",
    "block_lower_mv", "block_upper_mv", "block_fgs_sweep", "block_bgs_sweep",
    "block_jacobi_sweep", "block_unit_lower_sweep", "block_upper_solve_sweep",
    "run_sweeps", "invert_diag_blocks",
]
