import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import sys; sys.path.insert(0, '/root/repo')
from dynamite_tpu import config
config._initialize()
from dynamite_tpu.subspaces import SpinConserve
from dynamite_tpu.states import State
from dynamite_tpu.ops.rdm import rdm_spinconserve, rdm_host

for (L, k, keep) in [(8, 4, (0, 1, 2, 3)), (8, 4, (1, 3, 5)),
                     (9, 3, (0, 4, 8)), (10, 5, tuple(range(5))),
                     (8, 2, (2,)), (8, 8, (0, 1)), (8, 0, (0, 1))]:
    config._L = None
    config.L = L
    sub = SpinConserve(L, k)
    psi = State(state='random', subspace=sub, seed=L * 100 + k)
    got = rdm_spinconserve(psi, keep)
    want = rdm_host(psi, keep)
    err = np.abs(got - want).max()
    print(f'L={L} k={k} keep={keep}: err {err:.2e}')
    assert err < 1e-12, (L, k, keep, err)
print('OK')
