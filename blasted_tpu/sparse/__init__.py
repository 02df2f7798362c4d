"""Sparse storage formats and host-side preprocessing (reference layers L0-L2)."""

from .bsr import BSRMatrix, PaddedBSR
from .convert import (
    CSCMatrix,
    bsr_from_coo,
    bsr_to_csc,
    column_adjacency,
    csr_from_bsr,
    csr_from_coo,
    scaling_vector,
)
from .coo import (
    COOMatrix,
    MatrixReadError,
    read_matrix_market,
    read_matrix_market_vector,
    write_matrix_market,
)
from .csr import CSRMatrix, PaddedCSR, extend_zero, gather_padded
from .petsc_io import (
    petsc_block_size_hint,
    read_petsc_matrix,
    read_petsc_vector,
    write_petsc_matrix,
    write_petsc_vector,
)

__all__ = [
    "BSRMatrix", "PaddedBSR", "CSRMatrix", "PaddedCSR", "CSCMatrix",
    "COOMatrix", "MatrixReadError",
    "read_matrix_market", "read_matrix_market_vector", "write_matrix_market",
    "csr_from_coo", "bsr_from_coo", "csr_from_bsr", "bsr_to_csc",
    "scaling_vector", "column_adjacency", "extend_zero", "gather_padded",
    "read_petsc_matrix", "read_petsc_vector",
    "write_petsc_matrix", "write_petsc_vector", "petsc_block_size_hint",
]
