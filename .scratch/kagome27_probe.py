import time
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import sys
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/examples/scripts/kagome')
from dynamite_tpu import config
config.precision = 'single'
from run_kagome import cluster_model, ground_state_sector
from dynamite_tpu.solvers.eigs import random_start

H, edges = cluster_model('27a')
n = H.get_length()
sub, _ = ground_state_sector(n, True)
print('sites', n, 'dim', sub.get_dimension(), flush=True)
H.subspace = sub
t0 = time.perf_counter()
kernel = H.get_mat(subspaces=(sub, sub))
fn = kernel.traceable(sharded=False)
print(f'build {time.perf_counter()-t0:.1f}s', flush=True)
sp = kernel.sector_plan
if sp is not None:
    print('channels', sp.n_channels, 'tables GB', sp.table_bytes/1e9, flush=True)
dim = sub.get_dimension()
v0 = random_start(dim, np.float32, seed=1)
t0 = time.perf_counter()
y = fn(v0); y.block_until_ready()
print(f'matvec+compile {time.perf_counter()-t0:.1f}s', flush=True)
t0 = time.perf_counter()
y = fn(v0); y.block_until_ready()
print(f'matvec warm {time.perf_counter()-t0:.3f}s', flush=True)
# short lanczos at the production ncv to validate the basis memory
kops = kernel.krylov_ops(30, sharded=False)
t0 = time.perf_counter()
V, a, b = kops.lanczos(v0)
jax.block_until_ready((V, a, b))
print(f'30-step lanczos (incl compile) {time.perf_counter()-t0:.1f}s',
      flush=True)
print('alpha[:3]', np.asarray(a)[:3])
