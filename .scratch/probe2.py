"""Probe 2: temp-free combine on the 3-D basis + full fori_loop lanczos
program memory at kagome-27 scale."""
import json
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


def mem(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ma = c.memory_analysis()
    return {'arg_mb': round(ma.argument_size_in_bytes / 1e6, 1),
            'out_mb': round(ma.output_size_in_bytes / 1e6, 1),
            'temp_mb': round(ma.temp_size_in_bytes / 1e6, 1)}, c


def timeit(c, *args):
    r = c(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = c(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 5


DIM = 1 << 24
M = 40
w = jax.random.normal(jax.random.PRNGKey(0), (2, DIM), jnp.float32)
V3 = jax.random.normal(jax.random.PRNGKey(1), (M + 1, 2, DIM), jnp.float32)
cr = jax.random.normal(jax.random.PRNGKey(2), (M + 1,), jnp.float32)
ci = jax.random.normal(jax.random.PRNGKey(3), (M + 1,), jnp.float32)


def comb_inside(V, cr, ci):
    Vv = V.reshape(V.shape[0], -1)
    n = V.shape[-1]
    P = jnp.stack([cr, ci]) @ Vv
    wr = P[0, :n] - P[1, n:]
    wi = P[0, n:] + P[1, :n]
    return jnp.stack([wr, wi])


def comb_pqk(V, cr, ci):
    C = jnp.stack([jnp.stack([cr, -ci]), jnp.stack([ci, cr])])  # (2,2,m)
    return jnp.einsum('pqk,kqd->pd', C, V)


for name, fn in [('inside_flat', comb_inside), ('pqk', comb_pqk)]:
    try:
        info, c = mem(fn, V3, cr, ci)
        t = timeit(c, V3, cr, ci)
        emit(probe='combine2', variant=name, ms=round(t * 1e3, 2), **info)
    except Exception as e:
        emit(probe='combine2', variant=name, error=repr(e)[:300])


# --- full lanczos fori_loop programs (matvec = cheap xor shuffle) ---------
def matvec(v):
    # stand-in hermitian-ish matvec: xor permute + diag
    return jnp.stack([v[0] * 0.5 + jnp.roll(v[1], 1, axis=-1) * 0.1,
                      v[1] * 0.5 + jnp.roll(v[0], -1, axis=-1) * 0.1])


def lanczos_old(v0):
    V0 = jnp.zeros((M + 1, 2, DIM), v0.dtype).at[0].set(v0)
    a0 = jnp.zeros(M, v0.dtype)
    b0 = jnp.zeros(M, v0.dtype)
    ks = lax.broadcasted_iota(jnp.int32, (M + 1,), 0)

    def dots(V, w, mask):
        re = V[:, 0, :] @ w[0] + V[:, 1, :] @ w[1]
        im = V[:, 0, :] @ w[1] - V[:, 1, :] @ w[0]
        return re * mask, im * mask

    def comb(V, cr, ci):
        wr = cr @ V[:, 0, :] - ci @ V[:, 1, :]
        wi = cr @ V[:, 1, :] + ci @ V[:, 0, :]
        return jnp.stack([wr, wi])

    def step(j, carry):
        V, alpha, beta = carry
        wv = matvec(V[j])
        mask = (ks <= j).astype(v0.dtype)
        re, im = dots(V, wv, mask)
        wv = wv - comb(V, re, im)
        re2, im2 = dots(V, wv, mask)
        wv = wv - comb(V, re2, im2)
        a = re[j]
        b = jnp.sqrt(jnp.sum(wv * wv))
        vn = wv / jnp.where(b > 0, b, 1)
        return V.at[j + 1].set(vn), alpha.at[j].set(a), beta.at[j].set(b)

    return lax.fori_loop(0, M, step, (V0, a0, b0))


def lanczos_new(v0):
    V0 = jnp.zeros((M + 1, 2, DIM), v0.dtype).at[0].set(v0)
    a0 = jnp.zeros(M, v0.dtype)
    b0 = jnp.zeros(M, v0.dtype)
    ks = lax.broadcasted_iota(jnp.int32, (M + 1,), 0)

    def dots(V, w, mask):
        Vv = V.reshape((M + 1) * 2, DIM)
        D = lax.dot_general(Vv, w, (((1,), (1,)), ((), ())))
        D = D.reshape(M + 1, 2, 2)
        return (D[:, 0, 0] + D[:, 1, 1]) * mask, \
               (D[:, 0, 1] - D[:, 1, 0]) * mask

    def comb(V, cr, ci):
        Vv = V.reshape(M + 1, 2 * DIM)
        P = jnp.stack([cr, ci]) @ Vv
        wr = P[0, :DIM] - P[1, DIM:]
        wi = P[0, DIM:] + P[1, :DIM]
        return jnp.stack([wr, wi])

    def step(j, carry):
        V, alpha, beta = carry
        wv = matvec(V[j])
        mask = (ks <= j).astype(v0.dtype)
        re, im = dots(V, wv, mask)
        wv = wv - comb(V, re, im)
        re2, im2 = dots(V, wv, mask)
        wv = wv - comb(V, re2, im2)
        a = re[j]
        b = jnp.sqrt(jnp.sum(wv * wv))
        vn = wv / jnp.where(b > 0, b, 1)
        return V.at[j + 1].set(vn), alpha.at[j].set(a), beta.at[j].set(b)

    return lax.fori_loop(0, M, step, (V0, a0, b0))


for name, fn in [('old', lanczos_old), ('new', lanczos_new)]:
    try:
        info, c = mem(fn, w)
        t = timeit(c, w)
        emit(probe='lanczos', variant=name, ms=round(t * 1e3, 1), **info)
    except Exception as e:
        emit(probe='lanczos', variant=name, error=repr(e)[:300])

emit(done=True)
