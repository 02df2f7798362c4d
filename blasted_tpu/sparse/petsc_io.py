"""PETSc binary matrix/vector IO (no PETSc required).

Re-expresses the reference's PETSc IO utilities —
``src/utils/blasted_petsc_io.cpp:15-120`` (readVecFromFile / readMatFromFile)
and the standalone converter ``tests/utils/util_petsc_io.c`` — as a pure
NumPy reader/writer for the classic PETSc binary format, so the reference's
``.pmat`` golden fixtures (tests/input/fvens-2dcyl1/*.pmat) are first-class
inputs here without a PETSc build.

Format (all big-endian):
  Mat (SeqAIJ): int32 MAT_FILE_CLASSID (1211216), nrows, ncols, nnz,
                int32 rownnz[nrows], int32 colind[nnz], float64 vals[nnz]
  Vec:          int32 VEC_FILE_CLASSID (1211214), n, float64 vals[n]

An optional ``<file>.info`` side file may carry ``-matload_block_size bs``
(written by PETSc; we read and expose it as a hint, as MatLoad does).
"""

from __future__ import annotations

import os

import numpy as np

from .coo import COOMatrix, MatrixReadError

__all__ = [
    "MAT_FILE_CLASSID",
    "VEC_FILE_CLASSID",
    "read_petsc_matrix",
    "read_petsc_vector",
    "write_petsc_matrix",
    "write_petsc_vector",
    "petsc_block_size_hint",
]

MAT_FILE_CLASSID = 1211216
VEC_FILE_CLASSID = 1211214


def _read_exact(f, dtype, count, what: str) -> np.ndarray:
    a = np.fromfile(f, dtype=dtype, count=count)
    if a.size != count:
        raise MatrixReadError(f"truncated PETSc binary file: expected "
                              f"{count} {what}, got {a.size}")
    return a


def read_petsc_matrix(path: str) -> COOMatrix:
    """Read a PETSc-binary SeqAIJ matrix into a sorted COO container
    (reference: readMatFromFile, blasted_petsc_io.cpp:60-120)."""
    with open(path, "rb") as f:
        hdr = _read_exact(f, ">i4", 4, "header ints")
        classid, nrows, ncols, nnz = (int(x) for x in hdr)
        if classid != MAT_FILE_CLASSID:
            raise MatrixReadError(
                f"{path}: not a PETSc binary matrix (classid {classid})")
        if nrows < 0 or ncols < 0 or nnz < 0:
            raise MatrixReadError(f"{path}: negative sizes in header")
        rownnz = _read_exact(f, ">i4", nrows, "row lengths")
        if int(rownnz.sum()) != nnz:
            raise MatrixReadError(f"{path}: row lengths sum "
                                  f"{int(rownnz.sum())} != nnz {nnz}")
        colind = _read_exact(f, ">i4", nnz, "column indices")
        vals = _read_exact(f, ">f8", nnz, "values")
    rowind = np.repeat(np.arange(nrows, dtype=np.int32),
                       rownnz.astype(np.int64))
    return COOMatrix(nrows=nrows, ncols=ncols,
                     row=rowind.astype(np.int32),
                     col=colind.astype(np.int32),
                     val=vals.astype(np.float64))


def read_petsc_vector(path: str) -> np.ndarray:
    """Read a PETSc-binary Vec (reference: readVecFromFile)."""
    with open(path, "rb") as f:
        hdr = _read_exact(f, ">i4", 2, "header ints")
        classid, n = (int(x) for x in hdr)
        if classid != VEC_FILE_CLASSID:
            raise MatrixReadError(
                f"{path}: not a PETSc binary vector (classid {classid})")
        return _read_exact(f, ">f8", n, "values").astype(np.float64)


def write_petsc_matrix(path: str, m: COOMatrix,
                       block_size: int | None = None) -> None:
    """Write a COO matrix as PETSc-binary SeqAIJ (the util_petsc_io
    converter direction); optionally writes the ``-matload_block_size``
    .info side file PETSc's MatLoad consumes."""
    ms = m.sum_duplicates()  # sorted, unique — CSR-ordered triplets
    rownnz = np.bincount(ms.row, minlength=ms.nrows).astype(">i4")
    with open(path, "wb") as f:
        np.asarray([MAT_FILE_CLASSID, ms.nrows, ms.ncols, ms.nnz],
                   dtype=">i4").tofile(f)
        rownnz.tofile(f)
        ms.col.astype(">i4").tofile(f)
        ms.val.astype(">f8").tofile(f)
    if block_size is not None:
        with open(path + ".info", "w") as f:
            f.write(f"-matload_block_size {int(block_size)}\n")


def write_petsc_vector(path: str, v: np.ndarray) -> None:
    v = np.asarray(v, dtype=np.float64).ravel()
    with open(path, "wb") as f:
        np.asarray([VEC_FILE_CLASSID, v.size], dtype=">i4").tofile(f)
        v.astype(">f8").tofile(f)


def petsc_block_size_hint(path: str) -> int | None:
    """Block size from the matrix's ``.info`` side file, if present."""
    info = path + ".info"
    if not os.path.exists(info):
        return None
    with open(info) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2 and toks[0] == "-matload_block_size":
                return int(toks[1])
    return None
