"""Performance-testing harness.

Equivalent of the reference's perf harness (reference: tests/perftest/
perftesting.hpp:14-58 TimingRn fields, runperftest.cpp:104-139 speedup
report): one *reference* configuration plus a list of trial configurations,
reporting wall time, iteration counts, preconditioner setup/apply split, and
speedups.

The reference scales over OpenMP thread counts; the TPU analogue scales over
**sweep counts** (the accuracy/parallelism knob of the fixed-point operators)
— the exact level-scheduled run (sweeps −1) plays the single-thread reference
role.  Usable as a library (:func:`run_perf_test`) or CLI::

    python -m blasted_tpu.utils.perftest --npts 34 --pc ilu0 \
        --sweeps -1,-1 4,4 2,2 --ksp bicgstab
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

__all__ = ["TimingRun", "run_perf_test", "format_report"]


@dataclass
class TimingRun:
    """(reference: perftesting.hpp TimingRn, :18-58)"""

    label: str = ""
    walltime: float = 0.0
    precsetup_walltime: float = 0.0
    precapply_walltime: float = 0.0
    converged: bool = False
    iters: int = 0
    resnorm: float = 0.0
    convhis: list = field(default_factory=list)
    speedup: float = 0.0


def _one_run(A, b, options, repeats: int) -> TimingRun:
    import jax
    import jax.numpy as jnp

    from ..api import BlastedOptions, compute_preconditioner, setup_local_preconditioner
    from ..factory import to_device_matrix
    from ..ops.spmv import spmv
    from ..solvers import bicgstab, cg, gcr, gmres, richardson

    opts = BlastedOptions.from_dict(options) if isinstance(options, dict) else options
    D = to_device_matrix(A, prefer_dia=opts.prefer_dia)
    run = TimingRun(label=f"{opts.pc_type}{tuple(opts.async_sweeps)}")

    t0 = time.perf_counter()
    ctx = setup_local_preconditioner(D, opts)
    compute_preconditioner(ctx)
    # force completion with a value readback: block_until_ready does not
    # synchronise through tunnelled backends (see bench.py methodology)
    for leaf in jax.tree_util.tree_leaves(ctx.prec.state):
        float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))
    run.precsetup_walltime = time.perf_counter() - t0

    solver = {"richardson": richardson, "bicgstab": bicgstab, "gcr": gcr,
              "gmres": gmres, "cg": cg}[opts.ksp_type]
    bvec = jnp.asarray(np.asarray(b))
    kw = {"nrestart": opts.restart} if opts.ksp_type in ("gcr", "gmres") else {}

    def solve_once():
        return solver(lambda v: spmv(D, v), ctx.prec.apply_flat, bvec,
                      jnp.zeros_like(bvec), tol=opts.rtol,
                      maxiter=opts.maxiter, **kw)

    x, info = solve_once()          # warm-up/compile
    float(jnp.sum(x))
    times, iters = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x, info = solve_once()
        float(jnp.sum(x))           # readback forces execution
        times.append(time.perf_counter() - t0)
        iters.append(int(info.iters))
    run.walltime = float(np.mean(times))
    run.iters = int(np.mean(iters))
    run.converged = bool(info.converged)
    run.resnorm = float(info.resnorm)
    run.precapply_walltime = ctx.timers.apply_walltime
    return run


def run_perf_test(A, b, base_options: dict, sweep_list,
                  ref_sweeps=(-1, -1), repeats: int = 3):
    """Run the reference configuration then each trial; attach speedups
    (reference: runperftest.cpp:104-139)."""
    ref_opts = dict(base_options)
    ref_opts["blasted_async_sweeps"] = ",".join(str(s) for s in ref_sweeps)
    ref = _one_run(A, b, ref_opts, repeats)
    ref.label = "ref " + ref.label
    ref.speedup = 1.0
    runs = [ref]
    for sw in sweep_list:
        o = dict(base_options)
        o["blasted_async_sweeps"] = ",".join(str(s) for s in sw)
        r = _one_run(A, b, o, repeats)
        r.speedup = ref.walltime / r.walltime if r.walltime else 0.0
        runs.append(r)
    return runs


def format_report(runs) -> str:
    """Fixed-width report (reference report format: perftesting.hpp:39-58)."""
    hdr = (f"{'config':>18} {'wall(s)':>11} {'setup(s)':>11} "
           f"{'iters':>11} {'conv':>11} {'speedup':>11}")
    lines = [hdr]
    for r in runs:
        lines.append(f"{r.label:>18} {r.walltime:>11.4g} "
                     f"{r.precsetup_walltime:>11.4g} {r.iters:>11d} "
                     f"{str(r.converged):>11} {r.speedup:>11.3g}")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    from ..apps import poisson3d_system

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npts", type=int, default=26)
    ap.add_argument("--dist", default="chebyshev")
    ap.add_argument("--matrix", default=None, help="MatrixMarket file")
    ap.add_argument("--pc", default="ilu0")
    ap.add_argument("--ksp", default="bicgstab")
    ap.add_argument("--rtol", type=float, default=1e-8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sweeps", nargs="+", default=["4,4", "2,2", "1,1"])
    args = ap.parse_args(argv)

    if args.matrix:
        from ..sparse import csr_from_coo, read_matrix_market

        A = csr_from_coo(read_matrix_market(args.matrix))
        b = np.ones(A.nrows)
    else:
        A, b, _ = poisson3d_system((args.npts,) * 3, dist=args.dist)

    base = {"blasted_pc_type": args.pc, "ksp_type": args.ksp,
            "rtol": args.rtol}
    sweep_list = [tuple(int(s) for s in sw.split(",")) for sw in args.sweeps]
    runs = run_perf_test(A, b, base, sweep_list, repeats=args.repeats)
    print(format_report(runs))


if __name__ == "__main__":
    main()
