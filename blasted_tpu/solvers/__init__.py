"""Krylov solvers (reference: tests/solvers.{hpp,cpp}, promoted to library)."""

from .krylov import SolveInfo, bicgstab, cg, gcr, richardson

__all__ = ["SolveInfo", "bicgstab", "cg", "gcr", "richardson"]
