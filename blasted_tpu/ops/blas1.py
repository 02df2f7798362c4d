"""BLAS-1 reductions and vector updates.

Equivalents of the reference's blas1 (src/blas/blas1.cpp: maxnorm) and the
in-tree solver vector helpers (tests/solvers.cpp:16-60: axpby, axpbypcz, dot).
Trivial in JAX, kept as named functions so solver code reads like the spec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dot", "norm2", "maxnorm", "axpby", "axpbypcz"]


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def norm2(a: jax.Array) -> jax.Array:
    return jnp.sqrt(dot(a, a))


def maxnorm(a: jax.Array) -> jax.Array:
    """max |a_i| (reference: src/blas/blas1.cpp maxnorm)."""
    return jnp.max(jnp.abs(a))


def axpby(p: jax.Array, z: jax.Array, q: jax.Array, x: jax.Array) -> jax.Array:
    """z ← p z + q x (reference: tests/solvers.cpp:20-27)."""
    return p * z + q * x


def axpbypcz(p, z, q, x, r, y) -> jax.Array:
    """z ← p z + q x + r y (reference: tests/solvers.cpp:29-39)."""
    return p * z + q * x + r * y
