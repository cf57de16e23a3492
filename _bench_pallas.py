import time, sys
import numpy as np
import jax, jax.numpy as jnp

from dynamite_tpu import config
from dynamite_tpu.models import localized
from dynamite_tpu.subspaces import Full
from dynamite_tpu.ops.pallas_apply import build_pallas_apply

L = int(sys.argv[1]) if len(sys.argv) > 1 else 20
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

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

pfn = build_pallas_apply(kernel.plan, sub, sub)
assert pfn is not None
pjit = jax.jit(pfn)

t0 = time.perf_counter()
got = np.asarray(pjit(xd))
print(f'pallas compile+run: {time.perf_counter()-t0:.1f}s')
want = np.asarray(kernel.apply(xd))
scale = max(np.max(np.abs(want)), 1e-30)
err = np.max(np.abs(got - want)) / scale
print(f'max rel err vs XLA path: {err:.2e}')
assert err < 1e-5, err

checksum = jax.jit(lambda v: jnp.sum(v * v))

def timed(fn, n):
    start = time.perf_counter()
    v = xd
    for _ in range(n):
        v = fn(v)
    float(checksum(v))
    return time.perf_counter() - start

timed(pjit, 2)
el = timed(pjit, reps)
nnz = dim * H.nnz
print(f'pallas: {el/reps*1e3:.2f} ms/apply  {nnz*reps/el:.3e} nnz/s')
el2 = timed(kernel.apply, reps)
print(f'xla:    {el2/reps*1e3:.2f} ms/apply  {nnz*reps/el2:.3e} nnz/s')
