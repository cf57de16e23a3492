import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
print('devices:', len(jax.devices()))
from dynamite_tpu import config
from dynamite_tpu.models import heisenberg
from dynamite_tpu.subspaces import SpinConserve
from dynamite_tpu.parallel import mesh as mesh_mod

config.L = 10
config._initialize()
H = heisenberg(10)
sub = SpinConserve(10, 5)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
dim = sub.get_dimension()
print('dim', dim, 'mesh', config.mesh.devices.size)

rng = np.random.default_rng(0)
x = rng.standard_normal((2, dim)).astype(np.float32)
y_local = np.asarray(kernel.traceable(sharded=False)(jnp.asarray(x)))

xd = mesh_mod.device_put_state(x, config.mesh, dim)
fn = kernel.traceable(sharded=True)
y_sh = np.asarray(fn(xd))[:, :dim]
err = np.abs(y_sh - y_local).max() / max(np.abs(y_local).max(), 1e-30)
print('rel err', err)
assert err < 1e-5, err
print('OK')
