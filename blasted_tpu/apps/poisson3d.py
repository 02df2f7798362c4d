"""3-D Poisson finite-difference problem generator.

Self-contained fixture equivalent of the reference's ``tests/poisson3d-fd``
(reference: tests/poisson3d-fd/poisson3d_fd.cpp:43-150, cartmesh.cpp:145-183),
without PETSc's DMDA: pure NumPy assembly of the 7-point non-uniform-grid
stencil with zero Dirichlet boundary conditions, plus RHS and exact solution
``u = sin(2πx) sin(2πy) sin(2πz)``, ``f = 12π² u``.

Grid point distributions: ``uniform`` and ``chebyshev`` (cosine-clustered),
matching cartmesh.cpp.  Interior points are unknowns, ordered x-fastest
(i + nx*j + nx*ny*k), matching the DMDA natural ordering the reference uses.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..sparse.coo import COOMatrix
from ..sparse.convert import csr_from_coo

__all__ = ["CartMesh", "poisson3d_csr", "poisson3d_system"]


@dataclass
class CartMesh:
    """Cartesian tensor-product grid; npoind includes boundary points."""

    coords: list  # [x, y, z] arrays of point coordinates, each (npoind_d,)

    @staticmethod
    def uniform(npoind, rmin=(-1.0, -1.0, -1.0), rmax=(1.0, 1.0, 1.0)) -> "CartMesh":
        """(reference: cartmesh.cpp:167-183)"""
        return CartMesh([np.linspace(rmin[d], rmax[d], npoind[d]) for d in range(3)])

    @staticmethod
    def chebyshev(npoind, rmin=(-1.0, -1.0, -1.0), rmax=(1.0, 1.0, 1.0)) -> "CartMesh":
        """Cosine-clustered points (reference: cartmesh.cpp:145-163)."""
        coords = []
        for d in range(3):
            n = npoind[d]
            theta = np.pi / (n - 1)
            i = np.arange(n)
            coords.append((rmax[d] + rmin[d]) * 0.5
                          + (rmax[d] - rmin[d]) * 0.5 * np.cos(np.pi - i * theta))
        return CartMesh(coords)

    @property
    def ninterior(self):
        return tuple(len(c) - 2 for c in self.coords)


def poisson3d_csr(mesh: CartMesh):
    """Assemble the 7-point FD stencil over interior points as CSR.

    Stencil coefficients for a non-uniform grid exactly as in the reference
    (poisson3d_fd.cpp computeLHS, :84-150): for direction d with point coords
    c, the west/east couplings are −1/((c_I−c_{I−1})·½(c_{I+1}−c_{I−1})) and
    −1/((c_{I+1}−c_I)·½(c_{I+1}−c_{I−1})); the diagonal accumulates
    2/(c_{I+1}−c_{I−1})·(1/(c_{I+1}−c_I) + 1/(c_I−c_{I−1})) over directions.
    """
    x, y, z = mesh.coords
    nx, ny, nz = mesh.ninterior
    n = nx * ny * nz

    def west_east_diag(c, I):
        # I is the 1-offset (including-boundary) index array of interior points
        dm = c[I] - c[I - 1]
        dp = c[I + 1] - c[I]
        half = 0.5 * (c[I + 1] - c[I - 1])
        west = -1.0 / (dm * half)
        east = -1.0 / (dp * half)
        diag = 2.0 / (c[I + 1] - c[I - 1]) * (1.0 / dp + 1.0 / dm)
        return west, east, diag

    Ii = np.arange(1, nx + 1)
    Jj = np.arange(1, ny + 1)
    Kk = np.arange(1, nz + 1)
    wx, ex, dx = west_east_diag(x, Ii)
    wy, ey, dy = west_east_diag(y, Jj)
    wz, ez, dz = west_east_diag(z, Kk)

    i, j, k = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    idx = (i + nx * j + nx * ny * k).astype(np.int64)

    rows, cols, vals = [], [], []

    def add(mask, col_idx, v):
        rows.append(idx[mask])
        cols.append(col_idx[mask])
        vals.append(v[mask])

    diag = dx[i] + dy[j] + dz[k]
    add(np.ones_like(i, bool), idx, diag)
    add(i > 0, idx - 1, wx[i])
    add(i < nx - 1, idx + 1, ex[i])
    add(j > 0, idx - nx, wy[j])
    add(j < ny - 1, idx + nx, ey[j])
    add(k > 0, idx - nx * ny, wz[k])
    add(k < nz - 1, idx + nx * ny, ez[k])

    coo = COOMatrix(n, n,
                    np.concatenate(rows).astype(np.int32),
                    np.concatenate(cols).astype(np.int32),
                    np.concatenate(vals))
    return csr_from_coo(coo)


def poisson3d_system(npoints=(16, 16, 16), dist: str = "chebyshev"):
    """Build (A, b, u_exact) matching the reference's poisson.control default
    (16³ Chebyshev grid on [−1,1]³; reference: tests/poisson3d-fd/input/
    poisson.control, computeRHS poisson3d_fd.cpp:43-78)."""
    mesh = (CartMesh.chebyshev(npoints) if dist == "chebyshev"
            else CartMesh.uniform(npoints))
    A = poisson3d_csr(mesh)
    x, y, z = (c[1:-1] for c in mesh.coords)
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    u = (np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y) * np.sin(2 * np.pi * Z))
    f = 12.0 * np.pi ** 2 * u
    # flatten x-fastest: index = i + nx*j + nx*ny*k  →  transpose to (k, j, i)
    uex = u.transpose(2, 1, 0).ravel()
    rhs = f.transpose(2, 1, 0).ravel()
    return A, rhs, uex
