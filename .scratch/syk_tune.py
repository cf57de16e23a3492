import sys, time
import numpy as np
La = int(sys.argv[1]) if len(sys.argv) > 1 else None
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import jax.numpy as jnp
from jax import lax
from dynamite_tpu import config
from dynamite_tpu.ops import xor_dense as xd
import os
if os.environ.get('XD_KB'):
    xd.CHANNEL_BATCH = int(os.environ['XD_KB'])
from dynamite_tpu.models import syk
from dynamite_tpu.subspaces import Parity
from dynamite_tpu.utils.hoist import hjit

config.precision = 'single'
import os
config.L = int(os.environ.get('SYK_L', 16))
if La is not None:
    config.xor_dense_la = La
if os.environ.get('XD_BUDGET'):
    config.ell_budget = int(os.environ['XD_BUDGET'])
config._initialize()
H = syk(config.L)
H.scale(1.0 / float(np.sum(np.abs(H.msc['coeffs']))))
sub = Parity('even', L=config.L)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
fn = kernel.traceable(sharded=False)
dim = sub.get_dimension()
x = jax.random.normal(jax.random.PRNGKey(0), (2, dim), jnp.float32)
reps = int(os.environ.get('SYK_REPS', 20))
def body(v):
    v = lax.fori_loop(0, reps, lambda i, w: fn(w), v)
    return jnp.sum(v * v)
loop = hjit(body)
t0 = time.perf_counter(); float(loop(x)); print('compile', time.perf_counter()-t0)
t0 = time.perf_counter(); float(loop(x)); dt = time.perf_counter()-t0
nnz = dim * H.nnz
print(f'La={kernel.xor_dense_info["La"]} ch={kernel.xor_dense_info["channels"]} '
      f'table={kernel.xor_dense_info["table_bytes"]/1e9:.2f}GB '
      f'{dt/reps*1e3:.2f} ms  {nnz*reps/dt:.3e} nnz/s')
