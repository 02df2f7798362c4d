"""Built-in problem generators and drivers (reference: tests/poisson3d-fd)."""

from .poisson3d import CartMesh, poisson3d_csr, poisson3d_system

__all__ = ["CartMesh", "poisson3d_csr", "poisson3d_system"]
