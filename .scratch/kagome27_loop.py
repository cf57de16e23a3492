import sys, time
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/examples/scripts/kagome')
from dynamite_tpu import config
config.precision = 'single'
from run_kagome import cluster_model, ground_state_sector
from dynamite_tpu.solvers.eigs import random_start
from dynamite_tpu.utils.hoist import hjit

relabel = sys.argv[1] != 'orig' if len(sys.argv) > 1 else True
H, edges, labels = cluster_model('27a', relabel=relabel)
n = H.get_length()
sub, _ = ground_state_sector(n, True)
H.subspace = sub
kernel = H.get_mat(subspaces=(sub, sub))
fn = kernel.traceable(sharded=False)
sp_ = kernel.sector_plan
v0 = random_start(sub.get_dimension(), np.float32, seed=1)
reps = 5
def body(v):
    v = lax.fori_loop(0, reps, lambda i, w: fn(w) / 3.0, v)
    return jnp.sum(v * v)
loop = hjit(body)
t0 = time.perf_counter(); float(loop(v0))
print(f'compile {time.perf_counter()-t0:.1f}s', flush=True)
t0 = time.perf_counter(); float(loop(v0)); dt = time.perf_counter()-t0
print(f'relabel={relabel} channels={sp_.n_channels} '
      f'tables={sp_.table_bytes/1e9:.2f}GB  {dt/reps*1e3:.0f} ms/apply',
      flush=True)
