"""Single-chip roofline benchmark: SpMV + ILU(0) factor/apply vs speed-of-light.

Target (BASELINE.json): SpMV and fixed-point ILU0 factor+apply at ≥70% of
HBM-bandwidth speed-of-light per chip, measured in nnz/s.  The bench problem
is the reference's central fixture — a 3-D Poisson 7-point system — stored in
the gather-free DIA format (sparse/dia.py), so every kernel is shifted
streaming FMAs and the speed-of-light model is pure memory traffic.

Measurement methodology (required by this environment's tunnelled TPU):
- all large arrays are passed as jit *arguments* — closure constants are
  serialised into the remote-compile request at ~1 MB/s;
- `block_until_ready` does not synchronise through the tunnel, so every timed
  call returns a checksum scalar whose host readback forces execution;
- the ~30 ms call round-trip is cancelled by timing two variants with
  different in-graph iteration counts and using the slope;
- a dense streaming a·x+b loop is measured the same way as the attainable
  roofline (kernels cannot beat a contiguous stream).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
value = min measured-roofline fraction over {SpMV, ILU0 factor sweep, ILU0
apply sweep-pair}; vs_baseline = value / 0.70 (≥1 meets the target).
Diagnostics (incl. spec-sheet HBM fractions) go to stderr.
"""

import functools
import json
import os
import sys
import time

import numpy as np

_HBM_GBPS = {"v5e": 819.0, "v5p": 2765.0, "v4": 1228.0, "v6e": 1640.0}
HBM_BW = _HBM_GBPS.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"), 819.0) * 1e9

I1 = int(os.environ.get("BENCH_I1", "4"))
I2 = int(os.environ.get("BENCH_I2", "54"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def _slope_time(make_run, args):
    """Best-of-REPS call times at two iteration counts; return slope s/iter."""
    import jax

    t_at = {}
    for iters in (I1, I2):
        run = make_run(iters)
        s = float(run(*args))            # compile + upload + execute
        if not np.isfinite(s):
            print(f"  (checksum non-finite at iters={iters}: {s})",
                  file=sys.stderr)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            s = float(run(*args))
            best = min(best, time.perf_counter() - t0)
        t_at[iters] = best
    return max((t_at[I2] - t_at[I1]) / (I2 - I1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from blasted_tpu.apps import poisson3d_system
    from blasted_tpu.factory import to_device_matrix
    from blasted_tpu.ops.spmv import spmv
    from blasted_tpu.ops.sweeps import unit_lower_sweep, upper_solve_sweep
    from blasted_tpu.precond.dia_ilu0 import (
        dia_factor_sweep_tuple,
        dia_pairs,
    )
    from blasted_tpu.sparse.dia import DiaMatrix

    # interior (npts-2)^3 rows; default 160^3 = 4.1M (working set > VMEM)
    npts = int(os.environ.get("BENCH_NPTS", "162"))
    A, b, _ = poisson3d_system((npts, npts, npts), dist="uniform")
    D = to_device_matrix(A)
    assert isinstance(D, DiaMatrix)
    n, k = D.nrows, D.ndiags
    nnz = A.nnz
    isz = D.dtype.itemsize
    offsets = D.offsets
    print(f"n={n} nnz={nnz} diags={k} dtype={D.dtype} "
          f"spec HBM={HBM_BW/1e9:.0f}GB/s", file=sys.stderr)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), dtype=D.dtype)
    # chain-normalisation constants so iterated products stay finite
    amax = float(np.abs(np.asarray(D.data)).max())
    c_spmv = 1.0 / (amax * k)

    # ---- streaming roofline over the SAME (k, n) data array ----
    # y ← (Σ_d data[d] ⊙ y) · c reads k+1 arrays and writes one — byte-for-
    # byte the SpMV model without the shifts, so frac_spmv = t_stream/t_spmv
    # isolates exactly the shift overhead and VMEM-residency effects cancel.
    def mk_stream(iters):
        @jax.jit
        def run(dd, y):
            def body(i, v):
                acc = dd[0] * v
                for d in range(1, k):
                    acc = acc + dd[d] * v
                return acc * c_spmv
            out = jax.lax.fori_loop(0, iters, body, y)
            return jnp.sum(out)
        return run

    t_stream = _slope_time(mk_stream, (D.data, x))
    bytes_stream = (k + 2) * n * isz
    stream_bw = bytes_stream / t_stream
    print(f"stream roofline: {t_stream*1e3:.3f} ms/iter -> "
          f"{stream_bw/1e9:.0f} GB/s ({stream_bw/HBM_BW:.2f} of spec)",
          file=sys.stderr)

    # ---- SpMV (D passed as a pytree argument) ----
    def mk_spmv(iters):
        @jax.jit
        def run(Dm, v):
            out = jax.lax.fori_loop(
                0, iters, lambda i, u: spmv(Dm, u) * c_spmv, v)
            return jnp.sum(out)
        return run

    t_spmv = _slope_time(mk_spmv, (D, x))
    bytes_spmv = (k + 2) * n * isz
    frac_spmv = bytes_spmv / t_spmv / stream_bw
    print(f"spmv: {t_spmv*1e3:.3f} ms  {nnz/t_spmv/1e9:.2f} Gnnz/s  "
          f"roofline frac {frac_spmv:.3f} "
          f"(spec {bytes_spmv/t_spmv/HBM_BW:.3f})", file=sys.stderr)

    # ---- ILU0 factor sweep ----
    pairs = dia_pairs(offsets)
    d0 = offsets.index(0)

    mask_np = np.asarray(D.mask)
    mask_none = [bool(mask_np[d].all()) or offsets[d] < 0 for d in range(k)]

    def mk_fact(iters):
        @jax.jit
        def run(mask, base, ilu):
            base_t = tuple(base[d] for d in range(k))
            mask_t = tuple(None if mask_none[d] else mask[d] for d in range(k))
            out = jax.lax.fori_loop(
                0, iters,
                lambda i, v: dia_factor_sweep_tuple(offsets, pairs, d0,
                                                    mask_t, base_t, v),
                tuple(ilu[d] for d in range(k)))
            return jnp.sum(out[d0])
        return run

    t_fact = _slope_time(mk_fact, (D.mask, D.data, D.data))
    # traffic model for the pruned sweep: evolving diagonals only —
    # per sweep: d0 (base + 2 reads/pair + write) + each lower diag
    # (base + shifted udiag + write); pair-free upper diags are free
    kl_ = sum(1 for o in offsets if o < 0)
    npairs = len(pairs[d0])
    bytes_fact = (2 + 2 * npairs + 3 * kl_) * n * isz
    frac_fact = bytes_fact / t_fact / stream_bw
    print(f"ilu0 factor sweep: {t_fact*1e3:.3f} ms  "
          f"{nnz/t_fact/1e9:.2f} Gnnz/s  roofline frac {frac_fact:.3f} "
          f"(spec {bytes_fact/t_fact/HBM_BW:.3f})", file=sys.stderr)

    # ---- ILU0 apply (forward + backward sweep pair) ----
    @jax.jit
    def factor8(mask, base, ilu):
        base_t = tuple(base[d] for d in range(k))
        mask_t = tuple(None if mask_none[d] else mask[d] for d in range(k))
        out = jax.lax.fori_loop(
            0, 8, lambda i, v: dia_factor_sweep_tuple(offsets, pairs, d0,
                                                      mask_t, base_t, v),
            tuple(ilu[d] for d in range(k)))
        return jnp.stack(out)

    ilu = factor8(D.mask, D.data, D.data)
    dinv = 1.0 / jnp.where(ilu[d0] == 0, 1.0, ilu[d0])

    def mk_apply(iters):
        @jax.jit
        def run(Dm, iluv, di, z, y0):
            def pair(y):
                y1 = unit_lower_sweep(Dm, iluv, z, y)
                return upper_solve_sweep(Dm, iluv, di, z, y1)
            out = jax.lax.fori_loop(0, iters, lambda i, y: pair(y), y0)
            return jnp.sum(out)
        return run

    t_apply = _slope_time(mk_apply, (D, ilu, dinv, x, jnp.zeros_like(x)))
    kl = sum(1 for o in offsets if o < 0)
    ku = sum(1 for o in offsets if o > 0)
    bytes_apply = ((kl + 3) + (ku + 4)) * n * isz
    frac_apply = bytes_apply / t_apply / stream_bw
    print(f"ilu0 apply sweep-pair: {t_apply*1e3:.3f} ms  "
          f"roofline frac {frac_apply:.3f} "
          f"(spec {bytes_apply/t_apply/HBM_BW:.3f})", file=sys.stderr)

    value = min(frac_spmv, frac_fact, frac_apply)
    print(json.dumps({
        "metric": "min_roofline_fraction(spmv,ilu0_factor,ilu0_apply)",
        "value": round(float(value), 4),
        "unit": "fraction_of_measured_streaming_bandwidth",
        "vs_baseline": round(float(value / 0.70), 4),
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # skip the axon relay's shutdown stall


if __name__ == "__main__":
    main()
