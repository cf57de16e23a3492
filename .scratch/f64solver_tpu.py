import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import numpy as np
import sys; sys.path.insert(0, '/root/repo')
from dynamite_tpu import config
config.precision = 'double'
for L in (18,):
    config._L = None
    config.L = L
    config._initialize()
    import jax.numpy as jnp
    from dynamite_tpu.models import localized
    from dynamite_tpu.subspaces import SpinConserve
    from dynamite_tpu.computations import eigsolve
    H = localized(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    evals, evecs = eigsolve(H, nev=1, getvecs=True, tol=1e-12)
    kernel = H.get_mat(subspaces=(sub, sub))
    fn = kernel.traceable(sharded=False)
    dim = sub.get_dimension()
    v = evecs[0].data[:, :dim]
    hv = fn(v)
    lam = float(evals[0])
    resid = float(jnp.linalg.norm(hv - lam * v)) / abs(lam)
    nrm = float(jnp.linalg.norm(v))
    print(f'L={L} dim={dim} lam={lam:.6f} resid={resid:.3e} norm={nrm:.6f}')
