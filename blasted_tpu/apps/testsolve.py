"""Standalone solve driver/test binary.

Equivalent of the reference's ``testsolve`` executable
(reference: tests/testsolve.cpp:28-187, tests/runsolvetest.cpp): read a
Matrix-Market system plus optional RHS and reference solution, run a chosen
Krylov solver with a chosen preconditioner, report iterations/residuals, and
(when a reference solution is given) assert the error is below ``--testtol``
— exit status signals pass/fail exactly like the reference's CTest entries.

Usage::

    python -m blasted_tpu.apps.testsolve --matrix A.mtx --rhs b.mtx \
        --ref-solution x.mtx --solver bicgstab --prec ilu0 \
        --build-sweeps 4 --apply-sweeps 4 --tol 1e-8 --testtol 1e-6 \
        [--blocksize 4] [--no-dia]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

__all__ = ["run_testsolve", "main"]


def run_testsolve(args) -> int:
    import jax.numpy as jnp

    from ..api import BlastedOptions, solve
    from ..sparse import (
        bsr_from_coo,
        csr_from_coo,
        read_matrix_market,
        read_matrix_market_vector,
    )

    coo = read_matrix_market(args.matrix)
    if args.blocksize > 1:
        A = bsr_from_coo(coo, args.blocksize)
    else:
        A = csr_from_coo(coo)
    n = A.nrows

    b = (read_matrix_market_vector(args.rhs) if args.rhs
         else np.ones(n, dtype=np.float64))
    xref = (read_matrix_market_vector(args.ref_solution)
            if args.ref_solution else None)

    opts = BlastedOptions.from_dict({
        "blasted_pc_type": args.prec,
        "blasted_async_sweeps": f"{args.build_sweeps},{args.apply_sweeps}",
        "blasted_use_symmetric_scaling": args.scaling,
        "ksp_type": args.solver,
        "rtol": args.tol,
        "maxiter": args.maxiter,
        "prefer_dia": not args.no_dia,
    })

    t0 = time.perf_counter()
    x, info, ctx = solve(A, b, opts)
    wall = time.perf_counter() - t0
    x = np.asarray(x)

    print(f"  solver={args.solver} prec={args.prec} "
          f"sweeps=({args.build_sweeps},{args.apply_sweeps})")
    print(f"  converged={bool(info.converged)} iters={int(info.iters)} "
          f"relres={float(info.resnorm / info.bnorm):.3e} wall={wall:.3f}s")

    if not bool(info.converged):
        print("FAIL: did not converge", file=sys.stderr)
        return 2

    if xref is not None:
        # reference error norm: l2 of difference scaled by sqrt(n)
        # (reference: testsolve.cpp:107-116)
        err = np.linalg.norm(x - xref) / np.sqrt(n)
        print(f"  error vs reference solution = {err:.3e} "
              f"(testtol {args.testtol:.1e})")
        if err > args.testtol:
            print("FAIL: error above testtol", file=sys.stderr)
            return 1
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--matrix", required=True, help="MatrixMarket file")
    ap.add_argument("--rhs", default=None, help="MatrixMarket RHS vector")
    ap.add_argument("--ref-solution", default=None,
                    help="MatrixMarket reference solution vector")
    ap.add_argument("--solver", default="bicgstab",
                    choices=["richardson", "bicgstab", "gcr", "gmres", "cg"])
    ap.add_argument("--prec", default="jacobi")
    ap.add_argument("--build-sweeps", type=int, default=1)
    ap.add_argument("--apply-sweeps", type=int, default=1)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--blocksize", type=int, default=1)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--testtol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=2000)
    ap.add_argument("--no-dia", action="store_true",
                    help="disable the DIA fast-path detection")
    args = ap.parse_args(argv)
    return run_testsolve(args)


if __name__ == "__main__":
    sys.exit(main())
