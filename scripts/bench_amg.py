"""Real-TPU benchmark: end-to-end AMG-CG solve vs single-level SGS-CG.

Measures the PCMG-analogue (precond/multigrid.py) on the actual chip: a full
Krylov solve of the 3-D Poisson system with the AMG V-cycle as preconditioner,
against the same solve with the single-level SGS operator.  Every level of
the hierarchy is a DiaMatrix (gather-free shifted-FMA kernels), so the cycle
is pure streaming work; the coarse solve is a dense LU on the MXU.

Tunnel methodology (CLAUDE.md): all level data passes as jit *arguments*
(closure constants serialise into the remote-compile request at ~1 MB/s);
timings force execution with a checksum readback; the solve is one jitted
computation (Krylov `lax.while_loop`), so one round-trip per measured call.

Usage:  python scripts/bench_amg.py            # 128^3-interior, ~2.1 M rows
        BENCH_AMG_NPTS=66 python scripts/bench_amg.py   # quick smoke
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from blasted_tpu.apps import poisson3d_system
    from blasted_tpu.ops.spmv import spmv
    from blasted_tpu.ops.sweeps import bgs_sweep, fgs_sweep
    from blasted_tpu.precond.multigrid import AMGSettings, build_hierarchy
    from blasted_tpu.solvers import cg
    from blasted_tpu.sparse.dia import DiaMatrix

    npts = int(os.environ.get("BENCH_AMG_NPTS", "130"))
    rtol = float(os.environ.get("BENCH_AMG_RTOL", "1e-6"))
    smoother = os.environ.get("BENCH_AMG_SMOOTHER", "jacobi")
    A, b, _ = poisson3d_system((npts, npts, npts), dist="uniform")
    # isotropic brick aggregation: mesh-independent iteration counts
    # (1-D index blocks semicoarsen and degrade with depth — RESULTS.md)
    levels, Ac = build_hierarchy(A, AMGSettings(
        grid_shape=(npts - 2,) * 3, coarse_size=200,
        smoother_kind="jacobi"))   # kind here only to populate lev.rho
    Ds = tuple(lev.A_dev for lev in levels)
    for D in Ds:
        assert isinstance(D, DiaMatrix), "hierarchy fell off the DIA path"
    from blasted_tpu.precond.multigrid import _Level, _prolong, _restrict

    dinvs = tuple(1.0 / D.diag_vals for D in Ds)
    # transfer-only level descriptors (no device arrays captured in closures)
    tlev = [
        _Level(n=lev.n, nc=lev.nc, group=lev.group, A_dev=None, AT_dev=None,
               smoother=None, omega=0.0, dinv=None, shape=lev.shape,
               brick=lev.brick)
        for lev in levels]
    n = tlev[0].n
    print(f"n={n} levels={[t.n for t in tlev]}+coarse{Ac.shape[0]} "
          f"diags={[D.ndiags for D in Ds]} dtype={Ds[0].dtype}",
          file=sys.stderr)

    # the analytic RHS (sin products) is an eigenvector of the uniform-grid
    # stencil — CG would converge in O(1) steps; use a random RHS instead
    bj = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                     dtype=Ds[0].dtype)
    NPRE = NPOST = 1
    NS = 2  # SGS smoother fwd/bwd sweep count (1 has no GS character: the
    #         first Jacobi-on-triangular sweep from zero is just D^-1 —
    #         measured 47 vs 12 outer iterations at 32^3)

    def sgs_apply(D, dinv, r):
        y = fgs_sweep(D, dinv, r, jnp.zeros_like(r))
        for _ in range(NS - 1):
            y = fgs_sweep(D, dinv, r, y)
        z = bgs_sweep(D, dinv, y, jnp.zeros_like(r))
        for _ in range(NS - 1):
            z = bgs_sweep(D, dinv, y, z)
        return z

    rhos = [lev.rho for lev in levels]

    def smooth_step(li, D, dinv, bb, xx):
        if smoother == "jacobi":
            return xx + (1.4 / rhos[li]) * dinv * (bb - spmv(D, xx))
        if smoother == "cheb":
            lmax = rhos[li] * 1.05
            lmin = lmax / 4.0
            theta, delta = 0.5 * (lmax + lmin), 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_c = 1.0 / sigma
            d = dinv * (bb - spmv(D, xx)) / theta
            xx = xx + d
            rho_new = 1.0 / (2.0 * sigma - rho_c)
            r = dinv * (bb - spmv(D, xx))
            d = rho_new * rho_c * d + (2.0 * rho_new / delta) * r
            return xx + d
        return xx + sgs_apply(D, dinv, bb - spmv(D, xx))

    def make_cycle(lu):
        def cycle(li, Dt, dt, bb, xx):
            if li == len(tlev):
                return jax.scipy.linalg.lu_solve(lu, bb)
            D, dinv, lev = Dt[li], dt[li], tlev[li]
            for _ in range(NPRE):
                xx = smooth_step(li, D, dinv, bb, xx)
            rc = _restrict(lev, bb - spmv(D, xx))
            ec = cycle(li + 1, Dt, dt, rc, jnp.zeros((lev.nc,), bb.dtype))
            xx = xx + _prolong(lev, ec)
            for _ in range(NPOST):
                xx = smooth_step(li, D, dinv, bb, xx)
            return xx
        return cycle

    @jax.jit
    def solve_amg(Dt, dt, Acd, bb):
        lu = jax.scipy.linalg.lu_factor(Acd)
        cyc = make_cycle(lu)
        prec = lambda r: cyc(0, Dt, dt, r, jnp.zeros_like(r))
        x, info = cg(lambda v: spmv(Dt[0], v), prec, bb,
                     jnp.zeros_like(bb), tol=rtol, maxiter=200)
        return jnp.sum(x), info.iters, info.resnorm, info.bnorm

    @jax.jit
    def solve_sgs(D, dinv, bb):
        prec = lambda r: sgs_apply(D, dinv, r)
        x, info = cg(lambda v: spmv(D, v), prec, bb,
                     jnp.zeros_like(bb), tol=rtol, maxiter=2000)
        return jnp.sum(x), info.iters, info.resnorm, info.bnorm

    results = {}
    for name, fn, args in (
            ("amg", solve_amg, (Ds, dinvs, Ac.astype(Ds[0].dtype), bj)),
            ("sgs", solve_sgs, (Ds[0], dinvs[0], bj))):
        s, its, rn, bn = fn(*args)          # compile + upload + run
        float(s)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s, its, rn, bn = fn(*args)
            float(s)                         # readback forces execution
            best = min(best, time.perf_counter() - t0)
        results[name] = {
            "iters": int(its), "relres": float(rn) / float(bn),
            "seconds": round(best, 4),
            "ms_per_iter": round(best * 1e3 / max(int(its), 1), 3),
        }
        print(f"{name}-cg: iters={int(its)} relres={float(rn)/float(bn):.2e} "
              f"solve={best*1e3:.1f} ms  ({best*1e3/max(int(its),1):.2f} "
              f"ms/iter)", file=sys.stderr)

    # record into bench_detail.json (gen_results.py renders the "amg" key)
    # and a standalone perf report
    entry = {
        "n": int(n), "npts": npts, "rtol": rtol, "smoother": smoother,
        # own-keyed run stamp (disjoint from bench.py's) so gen_results'
        # stale-merge check keeps this entry alongside kernel sections
        "stamp": {"amg_npts": npts, "amg_rtol": rtol,
                  "amg_smoother": smoother},
        "levels": [int(t.n) for t in tlev] + [int(Ac.shape[0])],
        "amg_cg": results["amg"], "sgs_cg": results["sgs"],
        "speedup_vs_sgs": round(
            results["sgs"]["seconds"] / results["amg"]["seconds"], 3),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "bench_detail.json")
    try:
        import json
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged["amg"] = entry
        with open(path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        os.makedirs(os.path.join(root, "perf"), exist_ok=True)
        rep = os.path.join(
            root, "perf", f"AMG_r{os.environ.get('BENCH_ROUND', '05')}.txt")
        with open(rep, "w") as f:
            f.write("AMG-CG vs single-level SGS-CG, real TPU (v5e), "
                    f"{time.strftime('%Y-%m-%d')}\n"
                    f"{json.dumps(entry, indent=1)}\n")
    except (OSError, ValueError) as e:
        print(f"record failed: {e}", file=sys.stderr)

    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
