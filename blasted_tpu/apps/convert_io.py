"""Matrix/vector format converter CLI.

Equivalent of the reference's ``util_petsc_io`` executable
(tests/utils/util_petsc_io.c:14-96): reads a Matrix-Market matrix, an RHS
vector, and optionally an exact solution, and writes each as PETSc binary
(``<input>.pmat``).  ``--reverse`` converts PETSc binary back to
Matrix-Market, which the reference tool cannot do.

Usage:
    python -m blasted_tpu.apps.convert_io A.mtx b.mtx [--exact-soln x.mtx]
           [--block-size 4] [--reverse]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..sparse import (
    read_matrix_market,
    read_matrix_market_vector,
    read_petsc_matrix,
    read_petsc_vector,
    write_matrix_market,
    write_petsc_matrix,
    write_petsc_vector,
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Convert Matrix-Market <-> PETSc binary "
                    "(reference: util_petsc_io)")
    ap.add_argument("matfile", help="matrix file (.mtx, or .pmat with "
                                    "--reverse)")
    ap.add_argument("bfile", nargs="?", help="RHS vector file")
    ap.add_argument("--exact-soln", help="exact solution vector file")
    ap.add_argument("--block-size", type=int, default=None,
                    help="write -matload_block_size to the .info side file")
    ap.add_argument("--reverse", action="store_true",
                    help="PETSc binary -> Matrix-Market instead")
    args = ap.parse_args(argv)

    if args.reverse:
        m = read_petsc_matrix(args.matfile)
        write_matrix_market(args.matfile + ".mtx", m)
        print(f"wrote {args.matfile}.mtx "
              f"({m.nrows}x{m.ncols}, nnz={m.nnz})")
        for vf in filter(None, [args.bfile, args.exact_soln]):
            v = read_petsc_vector(vf)
            np.savetxt(vf + ".mtx", v,
                       header=f"%%MatrixMarket matrix array real general\n"
                              f"{v.size} 1", comments="")
            print(f"wrote {vf}.mtx (n={v.size})")
        return 0

    m = read_matrix_market(args.matfile)
    write_petsc_matrix(args.matfile + ".pmat", m, block_size=args.block_size)
    print(f"wrote {args.matfile}.pmat ({m.nrows}x{m.ncols}, nnz={m.nnz})")
    for vf in filter(None, [args.bfile, args.exact_soln]):
        v = read_matrix_market_vector(vf)
        write_petsc_vector(vf + ".pmat", v)
        print(f"wrote {vf}.pmat (n={v.size})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
