import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from dynamite_tpu import config
from dynamite_tpu.models import localized
from dynamite_tpu.subspaces import Full
from dynamite_tpu.ops.pallas_apply import build_pallas_apply

L = int(sys.argv[1]) if len(sys.argv) > 1 else 20
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
bb = int(sys.argv[3]) if len(sys.argv) > 3 else 13

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
nnz = dim * H.nnz
checksum = jax.jit(lambda v: jnp.sum(v * v))

def report(name, fn):
    # fori_loop version: n applies inside one jit
    def loop(v):
        return lax.fori_loop(0, reps, lambda i, w: fn(w), v)
    t0 = time.perf_counter()
    ljit = jax.jit(loop)
    out = ljit(xd)
    float(checksum(out))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(checksum(ljit(xd)))
    el = time.perf_counter() - t0
    print(f'{name} fori({reps}): compile+1st {tc:6.1f}s  run {el*1e3/reps:7.3f} ms/apply  {nnz*reps/el:.3e} nnz/s', flush=True)

t0 = time.perf_counter()
pfn = build_pallas_apply(kernel.plan, sub, sub, block_bits=bb)
print(f'build plan: {time.perf_counter()-t0:.1f}s')
report(f'pallas bb={bb}', pfn)
report('xla', kernel.traceable(sharded=False))
