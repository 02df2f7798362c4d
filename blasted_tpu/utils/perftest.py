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
    """(reference: perftesting.hpp TimingRn, :18-58)

    ``apply_slope_ms`` / ``setup_slope_ms`` are per-iteration KERNEL times
    measured as slopes over two in-graph iteration counts (bench.py
    methodology), which cancels the fixed per-call round-trip of a
    tunnelled device — ``slope_speedup`` (ref iters·apply-slope over trial
    iters·apply-slope) is the machine-meaningful speedup column; the
    wall-time columns remain end-to-end dispatch times."""

    label: str = ""
    walltime: float = 0.0
    precsetup_walltime: float = 0.0
    precapply_walltime: float = 0.0
    converged: bool = False
    iters: int = 0
    resnorm: float = 0.0
    convhis: list = field(default_factory=list)
    speedup: float = 0.0
    apply_slope_ms: float = 0.0      # per single preconditioner apply
    setup_slope_ms: float = 0.0      # per single factorization sweep
    slope_speedup: float = 0.0


def _slope(make_run, args, i1=4, i2=24, reps=3):
    """Best-of-reps call times at two in-graph iteration counts → s/iter
    (same as bench.py::_slope_time; cancels the fixed tunnel round-trip)."""
    t_at = {}
    for iters in (i1, i2):
        run = make_run(iters)
        float(run(*args))               # compile + first execution
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))           # value readback forces execution
            best = min(best, time.perf_counter() - t0)
        t_at[iters] = best
    return max((t_at[i2] - t_at[i1]) / (i2 - i1), 1e-9)


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

    # per-apply kernel slope via the pure shard-state protocol — (mat,
    # state, r) travel as jit ARGUMENTS (closure-captured device arrays
    # would serialize into a tunnelled remote-compile request)
    prec = ctx.prec
    bs = prec.block_size

    def mk_apply(iters):
        @jax.jit
        def f(mat, state, r):
            def body(i, rr):
                z = prec.apply_with(mat, state,
                                    rr.reshape(-1, bs) if bs > 1 else rr)
                z = z.reshape(-1)
                return z / jnp.linalg.norm(z)      # keep the chain finite
            return jnp.sum(jax.lax.fori_loop(0, iters, body, r))
        return f

    try:
        run.apply_slope_ms = 1e3 * _slope(
            mk_apply, (prec.mat, prec.state, bvec / jnp.linalg.norm(bvec)))
    except NotImplementedError:
        run.apply_slope_ms = 0.0

    # per-build-sweep slope: two one-shot setups at sweep counts b and b+64
    # through the same api path; the difference isolates the sweep kernel
    # (a small-delta difference drowns in the tunnel's ±10 ms call jitter at
    # ~0.1 ms/sweep — CLAUDE.md bench conditioning)
    bsw = opts.async_sweeps[0]
    if bsw > 0:
        import dataclasses

        def setup_time(nb):
            o2 = dataclasses.replace(
                opts, async_sweeps=(nb, opts.async_sweeps[1]))
            c2 = setup_local_preconditioner(D, o2)
            compute_preconditioner(c2)             # compile + first run
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                compute_preconditioner(c2)
                for leaf in jax.tree_util.tree_leaves(c2.prec.state):
                    float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = setup_time(bsw), setup_time(bsw + 256)
        run.setup_slope_ms = max(1e3 * (t2 - t1) / 256, 0.0)
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
    ref.slope_speedup = 1.0
    runs = [ref]
    for sw in sweep_list:
        o = dict(base_options)
        o["blasted_async_sweeps"] = ",".join(str(s) for s in sw)
        r = _one_run(A, b, o, repeats)
        r.speedup = ref.walltime / r.walltime if r.walltime else 0.0
        # machine-meaningful speedup: modeled preconditioning time
        # iters × per-apply kernel slope, ref over trial (tunnel-free)
        if r.apply_slope_ms and ref.apply_slope_ms:
            r.slope_speedup = (ref.iters * ref.apply_slope_ms) / \
                (r.iters * r.apply_slope_ms)
        runs.append(r)
    return runs


def format_report(runs) -> str:
    """Fixed-width report (reference report format: perftesting.hpp:39-58).
    The slope columns are per-iteration kernel times; wall(s) includes the
    per-call device round-trip (only caveat on tunnelled devices)."""
    hdr = (f"{'config':>18} {'wall(s)':>11} {'setup(s)':>11} "
           f"{'iters':>11} {'conv':>11} {'apply(ms)':>11} "
           f"{'sweep(ms)':>11} {'speedup':>11} {'slope-spd':>11}")
    lines = [hdr]
    for r in runs:
        lines.append(f"{r.label:>18} {r.walltime:>11.4g} "
                     f"{r.precsetup_walltime:>11.4g} {r.iters:>11d} "
                     f"{str(r.converged):>11} {r.apply_slope_ms:>11.4g} "
                     f"{r.setup_slope_ms:>11.4g} {r.speedup:>11.3g} "
                     f"{r.slope_speedup:>11.3g}")
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
