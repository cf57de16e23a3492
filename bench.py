"""
Headline benchmark: Pauli-SpMV throughput (matrix nonzeros per second per
chip) of the matrix-free matvec on the L=24 MBL-Heisenberg model, full
Hilbert space, single chip — the hot kernel under every evolve()/eigsolve().

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s/chip", "vs_baseline": N}

vs_baseline is the ratio against 1e10 nnz/s — a speed-of-light estimate for
the reference implementation on one CPU node (the reference is
memory-bandwidth-bound, docs/FAQ.rst:33-47: ~200 GB/s node bandwidth /
~16 bytes per nonzero touched ≈ 1.25e10; rounded to 1e10 since the reference
publishes no measured numbers — BASELINE.md).

Protocol: `reps` applications are chained inside ONE jitted lax.fori_loop and
the timed region ends with a host fetch of a checksum that depends on every
application — so neither per-dispatch latency (large on remote-execution
backends) nor async-dispatch undercounting pollutes the number.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dynamite_tpu import config
    from dynamite_tpu.models import localized
    from dynamite_tpu.subspaces import Full

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    config.precision = 'single'
    config.L = L
    config._initialize()

    H = localized(L)
    # normalize the spectrum so chained applications stay bounded in f32
    H.scale(1.0 / float(np.sum(np.abs(H.msc['coeffs']))))
    sub = Full(L=L)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    fn = kernel.traceable(sharded=False)

    dim = 1 << L
    nnz_per_row = H.nnz
    total_nnz = dim * nnz_per_row

    # generate the input on-device: a (2, 2^L) host->device transfer rides
    # the (slow) remote-execution tunnel and can dominate the wall time
    xd = jax.random.normal(jax.random.PRNGKey(0), (2, dim), jnp.float32)
    xd = xd / jnp.linalg.norm(xd)
    xd.block_until_ready()

    @jax.jit
    def loop(v):
        v = lax.fori_loop(0, reps, lambda i, w: fn(w), v)
        return jnp.sum(v * v)

    float(loop(xd))          # compile + warmup
    start = time.perf_counter()
    chk = float(loop(xd))
    elapsed = time.perf_counter() - start
    assert np.isfinite(chk)

    nnz_per_sec = total_nnz * reps / elapsed

    baseline = 1e10  # see module docstring
    print(json.dumps({
        'metric': f'pauli_spmv_L{L}_mbl_nnz_per_sec_per_chip',
        'value': nnz_per_sec,
        'unit': 'nnz/s',
        'vs_baseline': nnz_per_sec / baseline,
    }))


if __name__ == '__main__':
    main()
