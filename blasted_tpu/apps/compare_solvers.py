"""Solver-vs-reference equivalence comparator.

Re-expresses the reference's central testing pattern — run the *same* Krylov
solve twice, once with a reference configuration and once with the
configuration under test, then compare by ``-test_type``
(reference: tests/testutils.cpp:66-106, tests/testutils.c:114+, modes listed
in SURVEY.md §4.3):

- ``issame``        — iteration counts match within ``error_tolerance``
                      (relative) AND the solutions agree,
- ``compare_its``   — |its − ref_its| / ref_its ≤ ``error_tolerance``,
- ``upper_bound_its`` — its < ref_its (the async variant must *beat* the
                      reference, e.g. async SGS relaxation vs Jacobi),
- ``convergence``   — the test run converged; nothing else checked.

In the reference the "reference run" is PETSc's own serial preconditioner;
here it is any second options set — canonically the exact/sequential path
(sweeps = −1), which this framework guarantees equals the serial math
(SURVEY.md §7 step 5).  ``num_runs`` averages the test run's iteration count;
the reference uses this to smooth thread nondeterminism (−num_runs 3), our
sweeps are deterministic but the knob is kept for script parity.
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass

import numpy as np

__all__ = ["CompareResult", "compare_solves", "main"]


@dataclass
class CompareResult:
    passed: bool
    test_type: str
    ref_iters: float
    test_iters: float
    ref_converged: bool
    test_converged: bool
    solution_maxdiff: float

    def report(self) -> str:
        return (f"test_type={self.test_type} passed={self.passed} "
                f"ref_iters={self.ref_iters:g} test_iters={self.test_iters:g} "
                f"solution_maxdiff={self.solution_maxdiff:.3e}")


def compare_solves(A, b, ref_options, test_options, test_type: str = "issame",
                   error_tolerance: float = 1e-13, num_runs: int = 1,
                   mesh=None) -> CompareResult:
    """Run the reference and test configurations and compare.

    ``A`` is any container accepted by :func:`blasted_tpu.api.solve`;
    ``ref_options``/``test_options`` are ``BlastedOptions`` or dicts.
    """
    from ..api import solve

    x_ref, info_ref, _ = solve(A, b, ref_options, mesh=mesh)
    ref_iters = float(info_ref.iters)
    ref_conv = bool(info_ref.converged)

    its = []
    x_t = None
    for _ in range(max(1, num_runs)):
        x_t, info_t, _ = solve(A, b, test_options, mesh=mesh)
        its.append(float(info_t.iters))
    test_iters = float(np.mean(its))
    test_conv = bool(info_t.converged)

    maxdiff = float(np.max(np.abs(np.asarray(x_t) - np.asarray(x_ref))))
    xscale = float(np.max(np.abs(np.asarray(x_ref)))) or 1.0

    if test_type == "convergence":
        passed = test_conv
    elif test_type == "upper_bound_its":
        passed = test_conv and test_iters < ref_iters
    elif test_type == "compare_its":
        passed = test_conv and ref_conv and (
            abs(test_iters - ref_iters) <= error_tolerance * ref_iters)
    elif test_type == "issame":
        passed = (test_conv and ref_conv
                  and abs(test_iters - ref_iters) <= error_tolerance * max(ref_iters, 1.0)
                  and maxdiff <= max(error_tolerance, 1e-10) * xscale)
    else:
        raise ValueError(f"unknown test_type '{test_type}'")

    return CompareResult(passed=passed, test_type=test_type,
                         ref_iters=ref_iters, test_iters=test_iters,
                         ref_converged=ref_conv, test_converged=test_conv,
                         solution_maxdiff=maxdiff)


def _opts(prec, sweeps, solver, tol, maxiter, scaling):
    b, a = (int(s) for s in sweeps.split(","))
    return {
        "blasted_pc_type": prec,
        "blasted_async_sweeps": f"{b},{a}",
        "blasted_use_symmetric_scaling": scaling,
        "ksp_type": solver,
        "rtol": tol,
        "maxiter": maxiter,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Run the same solve with a reference and a test "
                    "preconditioner config and compare "
                    "(reference: testpetscsolver -test_type)")
    ap.add_argument("--matrix", required=True)
    ap.add_argument("--rhs", default=None)
    ap.add_argument("--blocksize", type=int, default=1)
    ap.add_argument("--solver", default="bicgstab")
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--maxiter", type=int, default=3000)
    ap.add_argument("--ref-prec", default="seqilu0")
    ap.add_argument("--ref-sweeps", default="-1,-1")
    ap.add_argument("--prec", default="ilu0")
    ap.add_argument("--sweeps", default="4,8")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--test-type", default="compare_its",
                    choices=["issame", "compare_its", "upper_bound_its",
                             "convergence"])
    ap.add_argument("--error-tolerance", type=float, default=0.05)
    ap.add_argument("--num-runs", type=int, default=1)
    args = ap.parse_args(argv)

    from ..sparse import (bsr_from_coo, csr_from_coo, read_matrix_market,
                          read_matrix_market_vector)

    coo = read_matrix_market(args.matrix)
    A = (bsr_from_coo(coo, args.blocksize) if args.blocksize > 1
         else csr_from_coo(coo))
    b = (read_matrix_market_vector(args.rhs) if args.rhs
         else np.ones(A.nrows, dtype=np.float64))

    res = compare_solves(
        A, b,
        _opts(args.ref_prec, args.ref_sweeps, args.solver, args.tol,
              args.maxiter, args.scaling),
        _opts(args.prec, args.sweeps, args.solver, args.tol,
              args.maxiter, args.scaling),
        test_type=args.test_type, error_tolerance=args.error_tolerance,
        num_runs=args.num_runs)
    print(res.report())
    return 0 if res.passed else 1


if __name__ == "__main__":
    sys.exit(main())
