"""Krylov solvers (reference: tests/solvers.{hpp,cpp}, promoted to library)."""

from .krylov import SolveInfo, bicgstab, cg, gcr, gmres, richardson

__all__ = ["SolveInfo", "bicgstab", "cg", "gcr", "gmres", "richardson"]
