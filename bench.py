"""Single-chip roofline benchmark: SpMV + ILU(0) factor/apply vs HBM speed-of-light.

Target (BASELINE.json): SpMV and fixed-point block-ILU0 factor+apply at ≥70%
of HBM-bandwidth speed-of-light per chip, measured in nnz/s.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value is the minimum HBM-bandwidth fraction over {SpMV, ILU0 factor
sweep, ILU0 apply sweep} and vs_baseline = value / 0.70 (≥1 means the
baseline target is met).  Diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

# HBM bandwidth per chip (GB/s): v5e ≈ 819, v5p ≈ 2765, v4 ≈ 1228.
_HBM_GBPS = {"v5e": 819.0, "v5p": 2765.0, "v4": 1228.0, "v6e": 1640.0}
HBM_BW = _HBM_GBPS.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"), 819.0) * 1e9


def _time_iterated(step_fn, x0, iters=50, reps=3):
    """Time ``iters`` chained applications of ``step_fn`` inside ONE jit call
    (the tunnelled TPU has multi-ms per-dispatch latency; chaining inside the
    computation measures on-device steady-state throughput)."""
    import jax

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: step_fn(v), x)

    out = run(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from blasted_tpu.apps import poisson3d_system
    from blasted_tpu.ops.spmv import spmv
    from blasted_tpu.ops.sweeps import unit_lower_sweep
    from blasted_tpu.precond.ilu0 import ILU0Preconditioner

    npts = int(os.environ.get("BENCH_NPTS", "98"))  # interior (npts-2)^3 rows
    A, b, _ = poisson3d_system((npts, npts, npts), dist="uniform")
    P = A.pad()
    n = P.nrows
    W = P.width
    nnz = int(np.asarray(P.nnz_total))
    nnzpad = n * W
    itemsize = P.vals_pad.dtype.itemsize
    print(f"n={n} nnz={nnz} W={W} pad_fill={nnz/nnzpad:.2f} "
          f"dtype={P.vals_pad.dtype} HBM={HBM_BW/1e9:.0f}GB/s",
          file=sys.stderr)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=P.dtype)

    # ---- SpMV ----
    t_spmv = _time_iterated(lambda v: spmv(P, v), x)
    # bytes: vals_pad + colind (int32) + gathered x + y write
    bytes_spmv = nnzpad * (itemsize + 4 + itemsize) + n * itemsize
    frac_spmv = bytes_spmv / t_spmv / HBM_BW
    print(f"spmv: {t_spmv*1e3:.3f} ms  {nnz/t_spmv/1e9:.2f} Gnnz/s  "
          f"HBM frac {frac_spmv:.2f}", file=sys.stderr)

    # ---- ILU0 machinery ----
    prec = ILU0Preconditioner(P, nbuildsweeps=1, napplysweeps=1)
    prec._ensure_symbolic()
    sym = prec.symbolic
    base = prec._scaled_vals(None)
    sweep = prec._factor_sweep_fn(base)
    t_fact = _time_iterated(sweep, base)
    Ppairs = sym.lowerp.shape[1]
    npairs_pad = nnz * Ppairs
    # bytes per factor sweep: base read + 2 pair gathers (idx + val each) +
    # diag gather + write
    bytes_fact = (nnz * itemsize + npairs_pad * 2 * (4 + itemsize)
                  + nnz * itemsize + nnz * itemsize)
    frac_fact = bytes_fact / t_fact / HBM_BW
    print(f"ilu0 factor sweep: {t_fact*1e3:.3f} ms  P={Ppairs}  "
          f"{nnz/t_fact/1e9:.2f} Gnnz/s  HBM frac {frac_fact:.2f}",
          file=sys.stderr)

    prec.compute()
    st = prec.state
    t_apply = _time_iterated(lambda y: unit_lower_sweep(P, st.ilu_pad, x, y),
                             jnp.zeros_like(x))
    # bytes per triangular sweep: ilu_pad + colind + gathered y + z read + write
    bytes_apply = nnzpad * (itemsize + 4 + itemsize) + 2 * n * itemsize
    frac_apply = bytes_apply / t_apply / HBM_BW
    print(f"ilu0 apply sweep: {t_apply*1e3:.3f} ms  HBM frac {frac_apply:.2f}",
          file=sys.stderr)

    value = min(frac_spmv, frac_fact, frac_apply)
    print(json.dumps({
        "metric": "min_hbm_sol_fraction(spmv,ilu0_factor,ilu0_apply)",
        "value": round(float(value), 4),
        "unit": "fraction_of_HBM_speed_of_light",
        "vs_baseline": round(float(value / 0.70), 4),
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # skip the axon relay's 2-minute shutdown stall


if __name__ == "__main__":
    main()
