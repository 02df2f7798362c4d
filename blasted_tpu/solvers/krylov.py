"""Krylov solvers: Richardson, BiCGSTAB, GCR, CG — jittable.

Equivalents of the reference's in-tree solvers (reference:
tests/solvers.cpp:90-352, tests/solvers.hpp:78-126), promoted here to
first-class library components.  Algorithms follow the reference line by line
(same update order, same convergence checks, same iteration counting) so
iteration-count parity tests carry over; control flow is ``lax.while_loop``
with a bounded trip count, so an entire solve is one XLA computation with no
host round-trips per iteration.

All solvers are right-preconditioned and operate on flat vectors through two
callables: ``amat(x)`` (the SpMV) and ``prec(r)`` (the preconditioner apply).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.blas1 import dot, norm2

__all__ = ["SolveInfo", "richardson", "bicgstab", "gcr", "cg", "gmres"]


class SolveInfo(NamedTuple):
    """(reference: tests/solvers.hpp SolveInfo — converged, iters, resnorm,
    bnorm; walltime is measured by the caller.)

    ``breakdown`` flags a Krylov breakdown (rho / rhat·v / t·t ≈ 0 in
    BiCGSTAB, p·Ap ≈ 0 in CG, q·q ≈ 0 in GCR): the solver stops with the
    last finite iterate instead of propagating NaN/Inf through the
    ``while_loop``.  The reference's solvers iterate to maxiter with finite
    values in that situation; here the event is detected and reported."""

    converged: jax.Array
    iters: jax.Array
    resnorm: jax.Array
    bnorm: jax.Array
    breakdown: jax.Array | bool = False


def _nz(d):
    """Division guard: exact zeros (or tiny denominators already flagged as
    breakdown) become 1 so the quotient stays finite; the caller discards
    the lane via the breakdown flag."""
    return jnp.where(d == 0, jnp.ones_like(d), d)


def richardson(amat: Callable, prec: Callable, b: jax.Array, x0: jax.Array,
               tol: float = 1e-6, maxiter: int = 500):
    """Preconditioned Richardson iteration
    (reference: tests/solvers.cpp RichardsonSolver::solve, :90-133)."""
    bnorm = norm2(b)

    def cond(c):
        x, step, resnorm, done = c
        return (step < maxiter) & ~done

    def body(c):
        x, step, _, _ = c
        s = b - amat(x)
        resnorm = norm2(s)
        done = resnorm / bnorm < tol
        dx = prec(s)
        x = jnp.where(done, x, x + dx)
        return x, step + jnp.where(done, 0, 1), resnorm, done

    x, step, resnorm, done = jax.lax.while_loop(
        cond, body, (x0, jnp.int32(0), bnorm, jnp.bool_(False)))
    # recompute final residual for reporting
    resnorm = norm2(b - amat(x))
    return x, SolveInfo(converged=resnorm / bnorm < tol, iters=step,
                        resnorm=resnorm, bnorm=bnorm)


def bicgstab(amat: Callable, prec: Callable, b: jax.Array, x0: jax.Array,
             tol: float = 1e-6, maxiter: int = 500):
    """Right-preconditioned BiCGSTAB, same update sequence and iteration
    count (iters = step+1) as the reference
    (reference: tests/solvers.cpp BiCGSTAB::solve, :140-244), plus breakdown
    guards on rho, rhat·v and t·t (see :class:`SolveInfo`)."""
    bnorm = norm2(b)
    r0 = b - amat(x0)
    rhat = r0
    nrhat = norm2(rhat)

    class S(NamedTuple):
        x: jax.Array
        r: jax.Array
        p: jax.Array
        v: jax.Array
        rhoold: jax.Array
        alpha: jax.Array
        omega: jax.Array
        step: jax.Array
        resnorm: jax.Array
        done: jax.Array
        breakdown: jax.Array

    dt = b.dtype
    eps = jnp.finfo(dt).eps
    tiny = jnp.finfo(dt).tiny
    s0 = S(x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
           jnp.ones((), dt), jnp.ones((), dt), jnp.ones((), dt),
           jnp.int32(0), jnp.asarray(100.0, dt), jnp.bool_(False),
           jnp.bool_(False))

    def cond(s):
        return (s.step < maxiter) & ~s.done

    def body(s):
        rho = dot(rhat, s.r)
        # breakdown: rhat ⟂ r structurally (the contrived/true-breakdown
        # dots compute to an exact 0; an eps-scale relative threshold false-
        # fires on f32 rounding noise at large n — measured on the 160^3
        # Poisson solve, where quasi-orthogonal rhat·r sits well below
        # 100·eps_f32·‖rhat‖‖r‖ while BiCGSTAB is converging fine)
        brk = jnp.abs(rho) <= eps * eps * nrhat * norm2(s.r) + 100 * tiny
        brk |= jnp.abs(s.rhoold * s.omega) <= 100 * tiny
        beta = rho * s.alpha / _nz(s.rhoold * s.omega)
        p = s.r + beta * s.p - beta * s.omega * s.v
        y = prec(p)
        v = amat(y)
        rv = dot(rhat, v)
        brk |= jnp.abs(rv) <= eps * eps * nrhat * norm2(v) + 100 * tiny
        alpha = rho / _nz(rv)
        rs = s.r - alpha * v                      # 's' of the algorithm
        z = prec(rs)
        t = amat(z)
        tt = dot(t, t)
        # t ≈ 0: the "lucky" half-step breakdown — x + αy is still valid
        lucky = tt <= 100 * tiny
        omega = jnp.where(lucky, jnp.zeros((), dt), dot(t, rs) / _nz(tt))
        x = s.x + alpha * y + omega * z
        r = rs - omega * t
        resnorm = norm2(r)
        # on breakdown keep the previous finite iterate
        x = jnp.where(brk, s.x, x)
        r = jnp.where(brk, s.r, r)
        resnorm = jnp.where(brk, s.resnorm, resnorm)
        conv = resnorm / bnorm < tol
        breakdown = s.breakdown | brk | (lucky & ~conv)
        done = conv | brk | lucky
        return S(x, r, p, v, rho, alpha, omega, s.step + 1, resnorm, done,
                 breakdown)

    s = jax.lax.while_loop(cond, body, s0)
    return s.x, SolveInfo(converged=s.resnorm / bnorm < tol,
                          iters=s.step, resnorm=s.resnorm, bnorm=bnorm,
                          breakdown=s.breakdown)


def gcr(amat: Callable, prec: Callable, b: jax.Array, x0: jax.Array,
        tol: float = 1e-6, maxiter: int = 500, nrestart: int = 30):
    """Restarted GCR (≈ flexible GMRES), right-preconditioned
    (reference: tests/solvers.cpp GCR::solve, :252-352).

    The Krylov bases P, Q live as fixed-shape ``(nrestart, n)`` arrays;
    orthogonalisation against directions ≤ k is a bounded dynamic loop over
    the k+1 built rows (the reference's 'optimize this with a multi-dot'
    comment, solvers.cpp:320 — here the projections touch O(k·n) bytes per
    iteration instead of the masked-dense form's O(m·n)).
    """
    n = b.shape[0]
    dt = b.dtype
    bnorm = norm2(b)

    class S(NamedTuple):
        x: jax.Array
        res: jax.Array
        P: jax.Array
        Q: jax.Array
        k: jax.Array
        step: jax.Array
        resnorm: jax.Array
        done: jax.Array
        breakdown: jax.Array

    def restart(x):
        res = b - amat(x)
        p0 = prec(res)
        q0 = amat(p0)
        P = jnp.zeros((nrestart, n), dt).at[0].set(p0)
        Q = jnp.zeros((nrestart, n), dt).at[0].set(q0)
        return res, P, Q

    tiny = jnp.finfo(dt).tiny
    res0, P0, Q0 = restart(x0)
    s0 = S(x0, res0, P0, Q0, jnp.int32(0), jnp.int32(0),
           norm2(res0), jnp.bool_(False), jnp.bool_(False))

    def cond(s):
        return (s.step < maxiter) & ~s.done

    def body(s):
        pk = s.P[s.k]
        qk = s.Q[s.k]
        qq = dot(qk, qk)
        # breakdown: A·p_k ≈ 0 (operator annihilated the direction)
        brk = qq <= 100 * tiny
        alpha = dot(s.res, qk) / _nz(qq)
        x = jnp.where(brk, s.x, s.x + alpha * pk)
        res = jnp.where(brk, s.res, s.res - alpha * qk)
        resnorm = jnp.where(brk, s.resnorm, norm2(res))
        step = s.step + 1
        conv = resnorm / bnorm < tol
        done = conv | brk

        def extend(_):
            z = prec(res)
            qn = amat(z)
            # β_l = −(q_new·q_l)/(q_l·q_l) for l ≤ k: a bounded dynamic loop
            # that reads only the k+1 built rows of P and Q (the previous
            # masked-dense matmul form read all nrestart rows every
            # iteration — O(m·n) traffic regardless of k); β is computed
            # from the unmodified q_new, so the math is unchanged
            def proj(l, c):
                pn, dq = c
                ql = s.Q[l]
                beta = -dot(ql, qn) / _nz(dot(ql, ql))
                return pn + beta * s.P[l], dq + beta * ql

            pn, dq = jax.lax.fori_loop(0, s.k + 1, proj,
                                       (z, jnp.zeros_like(z)))
            qn = qn + dq
            return (s.P.at[s.k + 1].set(pn), s.Q.at[s.k + 1].set(qn),
                    s.k + 1)

        def do_restart(_):
            resn, Pn, Qn = restart(x)
            return (Pn, Qn, jnp.int32(0))

        at_end = (s.k == nrestart - 1) | done | (step >= maxiter)
        P, Q, k = jax.lax.cond(at_end, do_restart, extend, None)
        # after a restart the residual is recomputed from x
        res = jnp.where(at_end & ~done, b - amat(x), res)
        return S(x, res, P, Q, k, step, resnorm, done, s.breakdown | brk)

    s = jax.lax.while_loop(cond, body, s0)
    return s.x, SolveInfo(converged=s.resnorm / bnorm <= tol,
                          iters=s.step, resnorm=s.resnorm, bnorm=bnorm,
                          breakdown=s.breakdown)


def gmres(amat: Callable, prec: Callable, b: jax.Array, x0: jax.Array,
          tol: float = 1e-6, maxiter: int = 500, nrestart: int = 30):
    """Restarted GMRES(m), right-preconditioned, with Givens rotations.

    Not in the reference's in-tree solver set (its GCR plays the flexible-
    GMRES role, tests/solvers.cpp:247-352) but named as the Krylov driver in
    the performance baseline (BASELINE.json); standard Saad formulation.
    The Arnoldi basis is a fixed-shape (m+1, n) array; one restart cycle is a
    single ``fori_loop`` with masked updates past convergence.
    """
    n = b.shape[0]
    m = nrestart
    dt = b.dtype
    bnorm = norm2(b)
    eps = jnp.asarray(1e-30, dt)

    class Outer(NamedTuple):
        x: jax.Array
        step: jax.Array
        resnorm: jax.Array
        done: jax.Array
        breakdown: jax.Array

    tiny = jnp.finfo(dt).tiny

    def arnoldi_cycle(x):
        r = b - amat(x)
        beta = norm2(r)

        V = jnp.zeros((m + 1, n), dt).at[0].set(r / jnp.maximum(beta, eps))
        H = jnp.zeros((m + 1, m), dt)
        cs = jnp.zeros((m,), dt)
        sn = jnp.zeros((m,), dt)
        g = jnp.zeros((m + 1,), dt).at[0].set(beta)

        class Inner(NamedTuple):
            V: jax.Array
            H: jax.Array
            cs: jax.Array
            sn: jax.Array
            g: jax.Array
            k: jax.Array       # columns actually built
            done: jax.Array
            brk: jax.Array     # Arnoldi breakdown without convergence

        def body(j, s):
            # masked no-op once converged within the cycle
            def live(s):
                w = amat(prec(s.V[j]))
                # true modified Gram-Schmidt over the j+1 built basis rows —
                # a bounded dynamic loop reading only those rows (the
                # previous masked-dense form read the whole (m+1, n) basis
                # twice per iteration regardless of j), and w is updated
                # between projections (better orthogonality than the
                # classical all-at-once projection)
                def mgs(i, c):
                    wi, h = c
                    vi = s.V[i]
                    hi = dot(vi, wi)
                    return wi - hi * vi, h.at[i].set(hi)

                w, h = jax.lax.fori_loop(
                    0, j + 1, mgs, (w, jnp.zeros((m + 1,), dt)))
                hnext = norm2(w)
                V = s.V.at[j + 1].set(w / jnp.maximum(hnext, eps))
                # apply previous Givens rotations to the new column
                def rot(i, hc):
                    hi = s.cs[i] * hc[i] + s.sn[i] * hc[i + 1]
                    hip = -s.sn[i] * hc[i] + s.cs[i] * hc[i + 1]
                    return hc.at[i].set(hi).at[i + 1].set(hip)

                hcol = h.at[j + 1].set(hnext)
                hcol = jax.lax.fori_loop(0, j, rot, hcol)
                # new rotation annihilating hcol[j+1]
                denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
                c = hcol[j] / jnp.maximum(denom, eps)
                sgn = hcol[j + 1] / jnp.maximum(denom, eps)
                hj = c * hcol[j] + sgn * hcol[j + 1]
                hcol = hcol.at[j].set(hj).at[j + 1].set(0.0)
                g1 = s.g.at[j + 1].set(-sgn * s.g[j]).at[j].set(c * s.g[j])
                H = s.H.at[:, j].set(hcol)
                res = jnp.abs(g1[j + 1])
                done = res / bnorm < tol
                # Arnoldi breakdown: the new column is annihilated entirely
                # (hnext ≈ 0 AND the rotated pivot hj ≈ 0 — structurally
                # singular operator; the Givens "residual" g1 is then
                # spurious).  A *happy* breakdown (hnext ≈ 0, hj ≠ 0:
                # invariant subspace with solvable H) converges instead.
                brk = (hnext <= 100 * tiny) & (jnp.abs(hj) <= 100 * tiny)
                return Inner(V, H, s.cs.at[j].set(c), s.sn.at[j].set(sgn),
                             g1, s.k + 1, done | brk, s.brk | brk)

            return jax.lax.cond(s.done, lambda s: s, live, s)

        s = jax.lax.fori_loop(
            0, m, body, Inner(V, H, cs, sn, g, jnp.int32(0), jnp.bool_(False),
                              jnp.bool_(False)))

        # back-substitution on the k×k upper-triangular H (masked for k<m)
        k = s.k
        y = jnp.zeros((m,), dt)

        def back(i_rev, y):
            i = k - 1 - i_rev
            num = s.g[i] - jnp.sum(s.H[i, :] * y)
            yi = num / jnp.where(s.H[i, i] == 0, 1.0, s.H[i, i])
            return jnp.where(i >= 0, y.at[i].set(yi), y)

        y = jax.lax.fori_loop(0, m, lambda i_rev, y:
                              jax.lax.cond(i_rev < k, lambda yy: back(i_rev, yy),
                                           lambda yy: yy, y), y)
        # combine only the k built basis rows (y is zero past k)
        xsum = jax.lax.fori_loop(0, k, lambda i, v: v + y[i] * s.V[i],
                                 jnp.zeros((n,), dt))
        dx = prec(xsum)
        return x + dx, k, jnp.abs(s.g[k]), s.brk

    def cond(o):
        return (o.step < maxiter) & ~o.done

    def body(o):
        x, k, res, brk = arnoldi_cycle(o.x)
        return Outer(x, o.step + k, res, (res / bnorm < tol) | brk,
                     o.breakdown | brk)

    r0 = norm2(b - amat(x0))
    o = jax.lax.while_loop(
        cond, body, Outer(x0, jnp.int32(0), r0, r0 / bnorm < tol,
                          jnp.bool_(False)))
    resnorm = norm2(b - amat(o.x))
    return o.x, SolveInfo(converged=resnorm / bnorm < tol * 1.01,
                          iters=o.step, resnorm=resnorm, bnorm=bnorm,
                          breakdown=o.breakdown)


def cg(amat: Callable, prec: Callable, b: jax.Array, x0: jax.Array,
       tol: float = 1e-6, maxiter: int = 500):
    """Preconditioned conjugate gradients (SPD systems).  Not in the
    reference's solver set but standard for its SPD fixtures (msc00726,
    uniform-grid Poisson); included as a first-class solver."""
    bnorm = norm2(b)
    r0 = b - amat(x0)
    z0 = prec(r0)
    dt = b.dtype
    eps = jnp.finfo(dt).eps
    tiny = jnp.finfo(dt).tiny

    class S(NamedTuple):
        x: jax.Array
        r: jax.Array
        z: jax.Array
        p: jax.Array
        rz: jax.Array
        step: jax.Array
        resnorm: jax.Array
        done: jax.Array
        breakdown: jax.Array

    s0 = S(x0, r0, z0, z0, dot(r0, z0), jnp.int32(0), norm2(r0),
           jnp.bool_(False), jnp.bool_(False))

    def cond(s):
        return (s.step < maxiter) & ~s.done

    def body(s):
        ap = amat(s.p)
        pap = dot(s.p, ap)
        # breakdown: p·Ap structurally 0 (indefinite operator) or r·z
        # annihilated; eps²-scale so f32 rounding noise at large n does not
        # false-fire (see bicgstab)
        brk = jnp.abs(pap) <= eps * eps * norm2(s.p) * norm2(ap) + 100 * tiny
        brk |= jnp.abs(s.rz) <= 100 * tiny
        alpha = s.rz / _nz(pap)
        x = jnp.where(brk, s.x, s.x + alpha * s.p)
        r = jnp.where(brk, s.r, s.r - alpha * ap)
        resnorm = jnp.where(brk, s.resnorm, norm2(r))
        conv = resnorm / bnorm < tol
        done = conv | brk
        z = prec(r)
        rz = dot(r, z)
        p = z + (rz / _nz(s.rz)) * s.p
        return S(x, r, z, p, rz, s.step + 1, resnorm, done,
                 s.breakdown | brk)

    s = jax.lax.while_loop(cond, body, s0)
    return s.x, SolveInfo(converged=s.resnorm / bnorm < tol,
                          iters=s.step, resnorm=s.resnorm, bnorm=bnorm,
                          breakdown=s.breakdown)
