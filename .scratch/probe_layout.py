"""Probe: how does XLA/TPU lay out (2, N) and (m, 2, N) f32 buffers, and
which formulation of the Krylov basis dots/combine avoids pathological
padding? Prints JSON lines."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def emit(**kw):
    print(json.dumps(kw), flush=True)


emit(backend=jax.default_backend(), devices=str(jax.devices()))

DIM = 1 << 24          # 16.7M — L=24 full space
M = 40                 # ncv-scale basis size


def mem(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ma = c.memory_analysis()
    return {
        'arg_mb': round(ma.argument_size_in_bytes / 1e6, 1),
        'out_mb': round(ma.output_size_in_bytes / 1e6, 1),
        'temp_mb': round(ma.temp_size_in_bytes / 1e6, 1),
    }, c


def timeit(c, *args):
    r = c(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = c(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 5


# --- 1. plain buffer passthrough: does (2, N) pad? -------------------------
x2 = jnp.zeros((2, DIM), jnp.float32)
x3 = jnp.zeros((M + 1, 2, DIM), jnp.float32)
xf = jnp.zeros((M + 1, 2 * DIM), jnp.float32)
x1 = jnp.zeros(2 * DIM, jnp.float32)

for name, x in [('2xN', x2), ('Mx2xN', x3), ('Mx2N', xf), ('flat', x1)]:
    info, _ = mem(lambda v: v + 1.0, x)
    logical = x.nbytes / 1e6
    emit(probe='passthrough', shape=name, logical_mb=round(logical, 1),
         **info)

# --- 2. dots variants ------------------------------------------------------
w = jax.random.normal(jax.random.PRNGKey(0), (2, DIM), jnp.float32)
V3 = jax.random.normal(jax.random.PRNGKey(1), (M + 1, 2, DIM), jnp.float32)
Vf = V3.reshape(M + 1, 2 * DIM)


def dots_current(V, w):
    re = V[:, 0, :] @ w[0] + V[:, 1, :] @ w[1]
    im = V[:, 0, :] @ w[1] - V[:, 1, :] @ w[0]
    return re, im


def dots_dotgen(V, w):
    Vv = V.reshape((M + 1) * 2, DIM)
    D = lax.dot_general(Vv, w, (((1,), (1,)), ((), ())))
    D = D.reshape(M + 1, 2, 2)
    return D[:, 0, 0] + D[:, 1, 1], D[:, 0, 1] - D[:, 1, 0]


def dots_flat(V, w):
    # V: (M+1, 2*DIM) rows [re|im]; W2: (2, 2*DIM)
    wflat = w.reshape(-1)
    wswap = jnp.concatenate([w[1], -w[0]]).reshape(-1)
    W2 = jnp.stack([wflat, wswap])
    D = lax.dot_general(V, W2, (((1,), (1,)), ((), ())))
    return D[:, 0], D[:, 1]


def dots_reduce(V, w):
    wflat = w.reshape(-1)
    wswap = jnp.concatenate([w[1], -w[0]]).reshape(-1)
    re = jnp.sum(V * wflat[None, :], axis=1)
    im = jnp.sum(V * wswap[None, :], axis=1)
    return re, im


for name, fn, args in [
        ('current_einsum', dots_current, (V3, w)),
        ('dotgen_3d', dots_dotgen, (V3, w)),
        ('dotgen_flat', dots_flat, (Vf, w)),
        ('reduce_flat', dots_reduce, (Vf, w))]:
    try:
        info, c = mem(fn, *args)
        t = timeit(c, *args)
        emit(probe='dots', variant=name, ms=round(t * 1e3, 2), **info)
    except Exception as e:
        emit(probe='dots', variant=name, error=repr(e)[:300])

# --- 3. combine variants ---------------------------------------------------
cr = jax.random.normal(jax.random.PRNGKey(2), (M + 1,), jnp.float32)
ci = jax.random.normal(jax.random.PRNGKey(3), (M + 1,), jnp.float32)


def comb_current(V, cr, ci):
    wr = cr @ V[:, 0, :] - ci @ V[:, 1, :]
    wi = cr @ V[:, 1, :] + ci @ V[:, 0, :]
    return jnp.stack([wr, wi])


def comb_flat(V, cr, ci):
    P = jnp.stack([cr, ci]) @ V          # (2, 2*DIM)
    wr = P[0, :DIM] - P[1, DIM:]
    wi = P[0, DIM:] + P[1, :DIM]
    return jnp.stack([wr, wi])


for name, fn, args in [
        ('current', comb_current, (V3, cr, ci)),
        ('flat', comb_flat, (Vf, cr, ci))]:
    try:
        info, c = mem(fn, *args)
        t = timeit(c, *args)
        emit(probe='combine', variant=name, ms=round(t * 1e3, 2), **info)
    except Exception as e:
        emit(probe='combine', variant=name, error=repr(e)[:300])

# --- 4. one lanczos-like step under remat pressure -------------------------
# mimic the solver inner loop at M=40: set row, dots, combine, set row
def step3(V, w):
    re, im = dots_current(V, w)
    w2 = w - comb_current(V, re, im)
    return V.at[3].set(w2), jnp.sum(w2 * w2)


def stepf(V, w):
    re, im = dots_flat(V, w)
    P = jnp.stack([re, im]) @ V
    wr = w[0] - (P[0, :DIM] - P[1, DIM:])
    wi = w[1] - (P[0, DIM:] + P[1, :DIM])
    w2 = jnp.stack([wr, wi])
    return V.at[3].set(w2.reshape(-1)), jnp.sum(w2 * w2)


for name, fn, args in [('step_3d', step3, (V3, w)),
                       ('step_flat', stepf, (Vf, w))]:
    try:
        info, c = mem(fn, *args)
        t = timeit(c, *args)
        emit(probe='step', variant=name, ms=round(t * 1e3, 2), **info)
    except Exception as e:
        emit(probe='step', variant=name, error=repr(e)[:300])

emit(done=True)
