"""Preconditioner protocol (reference layer L4 root).

Re-expresses the reference's ``Preconditioner`` interface — ``compute()``,
``apply()``, ``apply_relax()``, ``setApplyParams()``
(reference: include/solverops_base.hpp:31-64) — in a functional style:

- construction binds the operator to a *matrix view* (the preconditioner never
  owns the system matrix; reference invariant, solverops_base.cpp:20-25),
- :meth:`compute` builds/refreshes a pytree ``state`` held on the object,
- :meth:`apply` / :meth:`apply_relax` are pure in ``(state, vectors)`` and are
  traceable, so they can be closed over inside jitted Krylov loops.

Vector convention: scalar operators take flat ``(n,)`` vectors; block
operators take block-segment ``(nbrows, bs)`` arrays.  ``apply_flat`` adapts
either to flat vectors for the solvers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax

from ..sparse.bsr import PaddedBSR
from ..sparse.csr import PaddedCSR

__all__ = ["SolveParams", "Preconditioner", "NoPreconditioner", "PrecInfo"]


class SolveParams(NamedTuple):
    """Relaxation stopping parameters (reference: solverops_base.hpp
    setApplyParams — rtol/abstol/dtol/maxits)."""

    rtol: float = 0.0
    atol: float = 0.0
    dtol: float = 0.0
    usetol: bool = False
    maxits: int = 1


class PrecInfo(NamedTuple):
    """Preconditioner-quality diagnostics
    (reference: include/preconditioner_diagnostics.hpp:14-57)."""

    prec_rem_initial_norm: jax.Array | float = 0.0
    prec_remainder_norm: jax.Array | float = 0.0
    lower_avg_diag_dom: jax.Array | float = 0.0
    lower_min_diag_dom: jax.Array | float = 0.0
    upper_avg_diag_dom: jax.Array | float = 0.0
    upper_min_diag_dom: jax.Array | float = 0.0


class Preconditioner:
    """Base class; concrete operators bind a padded matrix and build state."""

    def __init__(self, mat: PaddedCSR | PaddedBSR):
        self.mat = mat
        self.state = None
        self.solveparams = SolveParams()

    # -- the reference triad -----------------------------------------------

    def compute(self) -> PrecInfo:
        raise NotImplementedError

    def apply(self, r: jax.Array) -> jax.Array:
        """Default: delegate to the explicit-state protocol."""
        return self.apply_with(self.mat, self.state, r)

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        """Apply reading ONLY ``(mat, state, r)`` plus static configuration
        (sweep counts, level counts) from ``self`` — the shard-state protocol
        for distribution (parallel/dist.py): ``LocalBlockPreconditioner``
        traces this once under ``shard_map`` with each device's slice of the
        stacked per-shard ``(mat, state)`` pytrees substituted.  Concrete
        operators implement this instead of :meth:`apply`; anything read from
        ``self`` here must be identical across shards."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement the shard-state "
            "apply protocol (apply_with)")

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def update_values(self, vals) -> None:
        """Push new numerical values through the existing operator, keeping
        every symbolic/cached structure (patterns, levels, padding) — the
        PCSetUp-every-Newton-step workflow (reference: blasted_petsc.cpp
        :314-327 re-factorizes in place over cached symbolic data;
        applications re-assemble via updateBlock, blockmatrices.ipp:354).

        ``vals`` is the flat nnz value array (CSR ``(nnz,)``,
        BSR ``(nnzb, bs, bs)``) or the DIA band data
        (``(k, n)`` / ``(k, nb, bs, bs)``).  Call :meth:`compute` afterwards
        to re-factorize with the new values.
        """
        if hasattr(self.mat, "with_new_vals"):
            self.mat = self.mat.with_new_vals(vals)
        elif hasattr(self.mat, "with_new_data"):
            self.mat = self.mat.with_new_data(vals)
        else:
            raise TypeError(
                f"{type(self.mat).__name__} has no value-update form")

    def set_apply_params(self, params: SolveParams) -> None:
        """(reference: solverops_base.hpp setApplyParams)"""
        self.solveparams = params

    def shard_setup(self, local, nshards: int):
        """Single-trace distributed setup from the STACKED per-shard local
        matrix pytree (leading shard axis) — no per-shard preconditioner
        objects are built (O(1) host constructions in nshards, VERDICT r3
        #8).  Returns ``(setup, template)``:

        - ``setup`` — stacked device inputs for :meth:`compute_state_with`
          (leading shard axis; ``()`` when the operator needs none),
        - ``template`` — the instance to trace compute/apply across shards
          (static configuration such as wavefront trip counts widened to
          cover every shard; often just ``self``),

        or ``NotImplemented`` when the operator cannot set up inside one
        trace (ragged shard-specific schedules: the exact/SEQUENTIAL paths)
        — the caller then falls back to a per-shard host loop."""
        return NotImplemented

    def compute_state_with(self, mat, setup):
        """Pure setup: build the apply-state from ``(mat, setup)`` plus
        static configuration only — the setup half of the shard-state
        protocol (cf. :meth:`apply_with`).  Vmapped over the shard axis by
        ``parallel.dist.LocalBlockPreconditioner`` so the distributed setup
        is one compiled computation instead of a host loop over shards
        (reference analogue: every MPI rank builds its context concurrently,
        blasted_petsc.cpp:216-311).  Returns ``(state, PrecInfo | None)``."""
        raise NotImplementedError

    def apply_state(self):
        """The state pytree :meth:`apply` actually reads.  Must be
        shape-uniform across shards of equal row count so per-shard states can
        be stacked for distribution (parallel/dist.py); operators whose full
        state contains shard-varying shapes (e.g. flat nnz arrays) override
        this to drop them."""
        return self.state

    def patched_for_shards(self, precs) -> "Preconditioner":
        """Return the template instance used to trace :meth:`apply_with`
        across all shards: static configuration read from ``self`` inside
        ``apply_with`` must cover every shard in ``precs`` (e.g. wavefront
        loop trip counts become the max over shards — extra masked levels are
        no-ops).  Default: no shard-varying statics, return self."""
        return self

    # -- adapters -----------------------------------------------------------

    @property
    def block_size(self) -> int:
        # duck-typed: PaddedBSR and BlockDiaMatrix expose bs; scalar forms don't
        return getattr(self.mat, "bs", 1)

    def apply_flat(self, r: jax.Array) -> jax.Array:
        """Apply on a flat (n,) vector regardless of block form."""
        bs = self.block_size
        if bs == 1:
            return self.apply(r)
        return self.apply(r.reshape(-1, bs)).reshape(-1)


class NoPreconditioner(Preconditioner):
    """Identity (reference: solverops_base.hpp:80-106, 'none')."""

    def compute(self) -> PrecInfo:
        self.state = ()
        return PrecInfo()

    def apply_with(self, mat, state, r: jax.Array) -> jax.Array:
        return r

    def apply_relax(self, b: jax.Array, x: jax.Array) -> jax.Array:
        raise NotImplementedError("No relaxation for 'none' preconditioner")
