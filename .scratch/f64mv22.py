import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import sys; sys.path.insert(0, '/root/repo')
from dynamite_tpu import config
config.precision = 'double'
config.L = 22
config._initialize()
import jax.numpy as jnp
from dynamite_tpu.models import localized
from dynamite_tpu.subspaces import SpinConserve
H = localized(22)
sub = SpinConserve(22, 11)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
fn = kernel.traceable(sharded=False)
dim = sub.get_dimension()
rng = np.random.default_rng(0)
x = rng.standard_normal((2, dim))
x /= np.linalg.norm(x)
y = np.asarray(fn(jnp.asarray(x)))
Hnp = H.to_numpy(subspaces=(sub, sub))  # scipy sparse
want = Hnp @ (x[0] + 1j * x[1])
err = np.abs((y[0] + 1j*y[1]) - want).max() / np.abs(want).max()
print('L=22 f64 matvec rel err', err)
