import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import sys; sys.path.insert(0, '/root/repo')
from dynamite_tpu import config
config.precision = 'double'
config.L = 18
config._initialize()
import jax.numpy as jnp
print('x64 enabled:', jax.config.jax_enable_x64)
from dynamite_tpu.models import localized
from dynamite_tpu.subspaces import SpinConserve
H = localized(18)
sub = SpinConserve(18, 9)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
fn = kernel.traceable(sharded=False)
dim = sub.get_dimension()
rng = np.random.default_rng(0)
x = rng.standard_normal((2, dim))
xd = jnp.asarray(x)
print('x dtype', xd.dtype)
y = fn(xd)
print('y dtype', y.dtype)
# oracle
Hnp = H.to_numpy(subspaces=(sub, sub))
want = Hnp @ (x[0] + 1j * x[1])
got = np.asarray(y)
err = np.abs((got[0] + 1j*got[1]) - want).max() / np.abs(want).max()
print('matvec rel err', err)
sp = kernel.sector_plan
if sp is not None:
    print('table dtypes', {str(np.asarray(c[4]).dtype) for c in sp.col_channels})
