#!/usr/bin/env python
"""Plot (or tabulate) fixed-point ILU convergence vs sweeps.

Equivalent of the reference's scripts/plotasyncconv.py:22-91 (log10 ILU
fixed-point residual and L/U factor error norms vs sweep count), driven by
the library's convergence-history utility instead of saved run files.

Usage:
    python scripts/plot_async_conv.py [--matrix A.mtx | --npts 16] \
        [--sweeps 30] [--scaling] [--out conv.png]

Writes a CSV next to the plot; plots only if matplotlib is available.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--matrix", default=None)
    ap.add_argument("--npts", type=int, default=12)
    ap.add_argument("--dist", default="chebyshev")
    ap.add_argument("--sweeps", type=int, default=30)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--out", default="async_conv.png")
    args = ap.parse_args(argv)

    from blasted_tpu.apps import poisson3d_system
    from blasted_tpu.sparse import csr_from_coo, read_matrix_market
    from blasted_tpu.utils.convergence import ilu_convergence_history

    if args.matrix:
        A = csr_from_coo(read_matrix_market(args.matrix))
    else:
        A, _, _ = poisson3d_system((args.npts,) * 3, dist=args.dist)

    h = ilu_convergence_history(A, max_sweeps=args.sweeps,
                                use_scaling=args.scaling)

    csv = args.out.rsplit(".", 1)[0] + ".csv"
    with open(csv, "w") as f:
        f.write("sweep,remainder,l_error,u_error\n")
        for i in range(len(h["remainder"])):
            f.write(f"{i},{h['remainder'][i]:.6e},"
                    f"{h['l_error'][i]:.6e},{h['u_error'][i]:.6e}\n")
    print(f"wrote {csv}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; CSV only")
        return

    s = np.arange(len(h["remainder"]))
    fig, ax = plt.subplots(figsize=(6, 4.2))
    tiny = 1e-17
    ax.plot(s, np.log10(h["remainder"] + tiny), "o-", label="ILU remainder")
    ax.plot(s, np.log10(h["l_error"] + tiny), "s-", label="max|L − L*|")
    ax.plot(s, np.log10(h["u_error"] + tiny), "^-", label="max|U − U*|")
    ax.set_xlabel("sweep")
    ax.set_ylabel("log10 value")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
