"""
The experimental Pallas kernel against the jnp engine (interpret mode, so
it runs on the CPU test mesh).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dynamite_tpu import config
from dynamite_tpu import models
from dynamite_tpu.subspaces import Full, Parity
from dynamite_tpu.ops.pallas_apply import build_pallas_apply


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


@pytest.mark.parametrize('case', ['full', 'parity'])
def test_pallas_vs_engine(case):
    L = 13
    if case == 'full':
        H, sub = models.localized(L), Full(L=L)
    else:
        H, sub = models.ising(L), Parity('even', L=L)
    H.allow_projection = True
    H.add_subspace(sub)
    kernel = H.get_mat()
    fn = build_pallas_apply(kernel.plan, sub, sub, interpret=True)
    assert fn is not None

    dim = sub.get_dimension()
    rng = np.random.RandomState(0)
    x = rng.standard_normal((2, dim)).astype(np.float32)
    x /= np.linalg.norm(x)
    xd = jnp.asarray(x)

    got = np.asarray(fn(xd))
    want = np.asarray(kernel.apply(xd))
    scale = max(np.max(np.abs(want)), 1e-30)
    assert np.max(np.abs(got - want)) / scale < 1e-5


@pytest.mark.parametrize('case', ['full', 'parity'])
def test_pallas_sharded_vs_oracle(case):
    """The distributed Pallas path (kernel on each device's local block
    inside shard_map, interpret mode on the CPU mesh) against the numpy
    oracle and the XLA sharded engine."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dynamite_tpu.parallel.mesh import make_mesh

    L = 13
    if case == 'full':
        H, sub = models.localized(L), Full(L=L)
    else:
        # heisenberg conserves number parity with off-diagonal (XX/YY)
        # terms, so the distributed pieces are actually exercised
        H, sub = models.heisenberg(L + 1), Parity('even', L=L + 1)
    H.allow_projection = True
    H.add_subspace(sub)

    saved = config.mesh
    try:
        config._mesh = make_mesh(mesh_shape=(8,))
        H.destroy_mat()
        kernel = H.get_mat(subspaces=(sub, sub))
        # drive the builder directly (the kernel-level gate requires
        # config.precision == 'single', which the shared test process
        # cannot switch to after initialization)
        from dynamite_tpu.ops.pallas_apply import build_pallas_sharded_parts
        parts = build_pallas_sharded_parts(kernel.plan, sub, sub, 3,
                                           interpret=True)
        assert parts is not None
        fn = kernel._wrap_sharded_pallas(parts)
        # the decomposition must actually exercise the distributed pieces
        assert any(h != 0 for h in kernel.pallas_plan.hi_list)
        assert kernel.pallas_plan.dev_masks

        dim = sub.get_dimension()
        rng = np.random.RandomState(0)
        x = rng.standard_normal((2, dim)).astype(np.float32)
        x /= np.linalg.norm(x)
        xd = jax.device_put(
            jnp.asarray(x), NamedSharding(config.mesh, P(None, 'd')))

        got = np.asarray(jax.jit(fn)(xd))
        want_np = H.to_numpy(subspaces=(sub, sub)) @ (x[0] + 1j * x[1])
        scale = max(np.max(np.abs(want_np)), 1e-30)
        assert np.max(np.abs((got[0] + 1j * got[1]) - want_np)) / scale < 1e-5

        # and against the XLA sharded engine
        want = np.asarray(kernel.sharded_fn(xd))
        assert np.max(np.abs(got - want)) / scale < 1e-5
    finally:
        config._mesh = saved
        H.destroy_mat()
