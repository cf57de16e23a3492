"""End-to-end drive: public API evolve on real TPU with the Pallas path."""
import numpy as np
import jax

from dynamite_tpu import config
from dynamite_tpu import models
from dynamite_tpu.operators import Operator
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full

config.precision = 'single'
config.L = 14
config._initialize()
print('backend:', jax.default_backend(), jax.devices()[0].device_kind)

L = 14
H = models.localized(L)
H.scale(0.25)
sub = Full(L=L)
H.add_subspace(sub)

psi = State(L=L, state='U' * (L // 2) + 'D' * (L - L // 2), subspace=sub)

# confirm the pallas path is actually selected
k = H.get_mat()
import dynamite_tpu.ops.apply as ap
print('pallas eligible:', ap._pallas_eligible(),
      'callable module:', k._local_callable.__module__ if hasattr(k._local_callable, '__module__') else '?',
      'qualname:', getattr(k._local_callable, '__qualname__', '?'))

res = H.evolve(psi, t=1.0)
v_pallas = res.to_numpy()

# oracle: scipy expm_multiply on the dense matrix
import scipy.sparse.linalg as sla
Hnp = H.to_numpy(sparse=True)
v0 = psi.to_numpy()
want = sla.expm_multiply(-1j * Hnp, v0)
err = np.linalg.norm(v_pallas - want) / np.linalg.norm(want)
print(f'evolve (pallas) vs scipy expm_multiply: rel err {err:.2e}')
assert err < 1e-4, err

# probe: force-disable pallas, rebuild kernel, same answer through XLA path
config.use_pallas = False
H.destroy_mat()
k2 = H.get_mat()
print('xla qualname:', getattr(k2._local_callable, '__qualname__', '?'))
res2 = H.evolve(psi, t=1.0)
v_xla = res2.to_numpy()
err2 = np.linalg.norm(v_pallas - v_xla) / np.linalg.norm(v_xla)
print(f'pallas vs xla path: rel err {err2:.2e}')
assert err2 < 1e-5, err2

# probe: matvec numerics directly, pallas vs xla, random vector
config.use_pallas = True
H.destroy_mat()
k3 = H.get_mat()
rng = np.random.RandomState(1)
x = rng.standard_normal((2, 1 << L)).astype(np.float32)
import jax.numpy as jnp
ya = np.asarray(k3.apply(jnp.asarray(x)))
yb = np.asarray(k2.apply(jnp.asarray(x)))
err3 = np.max(np.abs(ya - yb)) / max(np.max(np.abs(yb)), 1e-30)
print(f'raw matvec pallas vs xla: max rel err {err3:.2e}')
assert err3 < 1e-5, err3

# probe: eigsolve ground state through pallas path vs dense numpy eigh
evals = H.eigsolve(nev=1, which='lowest', tol=1e-7)
wnp = np.linalg.eigvalsh(H.to_numpy())
print(f'eigsolve lowest: {evals[0]:.8f} vs numpy {wnp[0]:.8f} '
      f'(diff {abs(evals[0]-wnp[0]):.2e})')
assert abs(evals[0] - wnp[0]) < 1e-4

print('ALL OK')
