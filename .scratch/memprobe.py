import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from dynamite_tpu import config
from dynamite_tpu.parallel.mesh import make_mesh, device_put_state, storage_dim
from dynamite_tpu.subspaces import SpinConserve
from dynamite_tpu import models

config._initialize()
for nd in (2, 4, 8):
    config._mesh = make_mesh(mesh_shape=(nd,))
    L = 16
    H = models.heisenberg(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    dim = sub.get_dimension()
    sdim = storage_dim(dim, config.mesh)
    x = device_put_state(np.zeros((2, dim), np.float32), config.mesh, dim)
    fn = kernel.sharded_fn
    c = jax.jit(lambda v: fn(v)).lower(x).compile()
    ma = c.memory_analysis()
    state = 2 * sdim * 4
    print(f'nd={nd} temp={ma.temp_size_in_bytes} state={state} '
          f'ratio_total={ma.temp_size_in_bytes/state:.2f} '
          f'ratio_perdev={ma.temp_size_in_bytes/state*nd/nd:.2f}')
