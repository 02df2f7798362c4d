import os, time
import numpy as np, jax, jax.numpy as jnp
from blasted_tpu.ops.bstencil import bdia_factor_u0_sweep_stencil, stack_factor_coeffs
from blasted_tpu.precond.bdia_ilu0 import _soa_gj_inverse
from blasted_tpu.precond.dia_ilu0 import dia_pairs
from blasted_tpu.ops.stencil import stencil_plan

bs, g = 4, 128
nb = g**3
b2 = bs*bs
offsets = (-g*g, -g, -1, 0, 1, g, g*g)
d0 = offsets.index(0)
pairs = dia_pairs(offsets)
pairs_key = [tuple(p) for p in pairs[d0]]
pair_offs = tuple(o1 for (_,_,o1) in pairs_key)
T, nt = stencil_plan(offsets, nb)
k = len(offsets)

@jax.jit
def gen(key):
    # C stack (112, nb) and u0 slab directly
    C = 0.1*jax.random.normal(key, (b2*(1+2*len(pairs_key)), nb), dtype=jnp.float32)
    u0rows = [0.1*jax.random.normal(jax.random.fold_in(key, r), (nb,), dtype=jnp.float32) + (3.0 if r % (bs+1) == 0 else 0.0) for r in range(b2)]
    return C, tuple(u0rows)
C, u0 = gen(jax.random.PRNGKey(0))
maskd = jnp.ones((nb,), bool)

def meas(mk, args, i1=2, i2=10, reps=6):
    ts={}
    for it in (i1,i2):
        f=mk(it); float(f(*args)); best=1e9
        for _ in range(reps):
            t0=time.perf_counter(); float(f(*args)); best=min(best,time.perf_counter()-t0)
        ts[it]=best
    return (ts[i2]-ts[i1])/(i2-i1)

# A: kernel-only loop (chain slab through kernel, fixed C)
def mkA(iters):
    @jax.jit
    def f(Cs, dinvp0):
        def body(i, dp):
            out = bdia_factor_u0_sweep_stencil(pair_offs, Cs, dp, bs, T)
            return out
        return jnp.sum(jax.lax.fori_loop(0, iters, body, dinvp0)[0])
    return f
dinvp0 = jnp.pad(jnp.stack([u0[r] for r in range(b2)]), ((0,0),(T,T)))
t = meas(mkA, (C, dinvp0))
print(f'kernel-only {t*1e3:.3f} ms ({(7+1+1)*b2*nb*4/t/1e9:.0f} GB/s at 9-blk model)', flush=True)

# B: GJ + padslab glue only
def mkB(iters):
    @jax.jit
    def f(u0t):
        def body(i, rows):
            dinv = _soa_gj_inverse(rows, bs, maskd)
            dinvp = jnp.pad(jnp.stack(list(dinv)), ((0,0),(T,T)))
            rows2 = tuple(dinvp[r, T:-T] for r in range(b2))
            return rows2
        out = jax.lax.fori_loop(0, iters, body, u0t)
        return sum(jnp.sum(o) for o in out)
    return f
t = meas(mkB, (u0,))
print(f'gj+glue {t*1e3:.3f} ms', flush=True)
os._exit(0)
