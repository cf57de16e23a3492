import time, sys
import numpy as np
import jax, jax.numpy as jnp

from dynamite_tpu import config
from dynamite_tpu.models import localized
from dynamite_tpu.subspaces import Full
from dynamite_tpu.ops.pallas_apply import build_pallas_apply

L = int(sys.argv[1]) if len(sys.argv) > 1 else 24
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

config.precision = 'single'
config.L = L
config._initialize()

H = localized(L)
H.scale(1.0 / float(np.sum(np.abs(H.msc['coeffs']))))
sub = Full(L=L)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))

dim = 1 << L
rng = np.random.RandomState(0)
x = rng.standard_normal((2, dim)).astype(np.float32)
x /= np.linalg.norm(x)
xd = jnp.asarray(x)
want = np.asarray(kernel.apply(xd))
scale = max(np.max(np.abs(want)), 1e-30)
checksum = jax.jit(lambda v: jnp.sum(v * v))
nnz = dim * H.nnz

def timed(fn, n):
    start = time.perf_counter()
    v = xd
    for _ in range(n):
        v = fn(v)
    float(checksum(v))
    return time.perf_counter() - start

for bb in [int(a) for a in sys.argv[3:]] or [13, 14, 15, 16]:
    try:
        pfn = build_pallas_apply(kernel.plan, sub, sub, block_bits=bb)
        pjit = jax.jit(pfn)
        t0 = time.perf_counter()
        got = np.asarray(pjit(xd))
        tc = time.perf_counter() - t0
        err = np.max(np.abs(got - want)) / scale
        timed(pjit, 2)
        el = timed(pjit, reps)
        print(f'bb={bb}: compile {tc:5.1f}s  err {err:.1e}  '
              f'{el/reps*1e3:7.2f} ms/apply  {nnz*reps/el:.3e} nnz/s', flush=True)
    except Exception as e:
        print(f'bb={bb}: FAILED {type(e).__name__}: {str(e)[:200]}', flush=True)
