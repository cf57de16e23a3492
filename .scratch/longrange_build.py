import time
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, '/root/repo')
from dynamite_tpu import config
config.precision = 'single'
config.L = 24
config._initialize()
from dynamite_tpu.models import long_range
from dynamite_tpu.subspaces import SpinConserve
from dynamite_tpu.ops import sector_apply

H = long_range(24)
H.scale(1.0 / float(np.sum(np.abs(H.msc['coeffs']))))
H.allow_projection = True
sub = SpinConserve(24, 12)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
plan = kernel.plan
print('groups', len(plan.groups), 'limit', sector_apply.SECTOR_GROUP_LIMIT)
print('supported now:', sector_apply.sector_supported(plan, sub, sub))
print('table estimate GB',
      sector_apply.table_bytes_estimate(plan, sub, sub) / 1e9)
sector_apply.SECTOR_GROUP_LIMIT = 1 << 14
t0 = time.perf_counter()
sp = sector_apply.SectorPlan(plan, sub, sub, np.float32)
print(f'SectorPlan build {time.perf_counter()-t0:.1f}s '
      f'channels={sp.n_channels} tables={sp.table_bytes/1e9:.2f} GB')
