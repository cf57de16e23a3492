"""
Distributed-matvec integration tests on the virtual CPU mesh: the general
all-gather path (SpinConserve/Explicit — non-power-of-two dimensions) and
the XOR ppermute fast path must both match the local kernel and the numpy
oracle. (The reference covers the analogous paths with its mpirun -n {1,3,4}
test matrix, run_all_tests.py:101-141.)
"""

import numpy as np
import pytest
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamite_tpu import config
from dynamite_tpu.parallel.mesh import make_mesh, AXIS
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve, Explicit
from dynamite_tpu import models

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    saved = config.mesh
    yield
    config._mesh = saved
    config._L = None
    config._subspace = None


def with_mesh(n):
    config._initialize()
    config._mesh = make_mesh(mesh_shape=(n,))
    return config.mesh


def check_sharded_dot(H, sub, mesh, rtol=1e-5):
    H = H.copy()
    H.allow_projection = True
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_supported

    s = State(state='random', subspace=sub, seed=13)
    # the state must actually be sharded over the mesh axis
    assert s.data.sharding.spec == P(None, AXIS)
    assert kernel.should_shard(s.data)

    got = H.dot(s).to_numpy()
    expected = H.to_numpy() @ s.to_numpy()
    scale = max(np.max(np.abs(expected)), 1e-30)
    assert np.max(np.abs(got - expected)) / scale < rtol


def test_spinconserve_general_path():
    """C(6,3) = 20 rows over 4 devices: the all-gather general path."""
    mesh = with_mesh(4)
    H = models.localized(L)
    check_sharded_dot(H, SpinConserve(L, L // 2), mesh)


def test_spinconserve_syk_scan_path():
    """SYK pushes past the unroll limits -> the scan variant of the
    general sharded path."""
    mesh = with_mesh(4)
    H = models.syk(3)  # 6 spins, many terms
    check_sharded_dot(H, SpinConserve(L, L // 2), mesh)


def test_explicit_general_path():
    mesh = with_mesh(4)
    sub = SpinConserve(L, 2)
    states = sub.idx_to_state(np.arange(sub.get_dimension()))
    # any sorted state list works; pick one whose size divides the mesh
    ex = Explicit(states[:12], L=L)
    H = models.localized(L)
    check_sharded_dot(H, ex, mesh)


def test_full_xor_path_matches_general():
    """Full subspace on a power-of-two mesh uses the ppermute fast path;
    cross-check it against the local kernel result."""
    mesh = with_mesh(8)
    H = models.ising(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_supported and kernel._xor_sharded_eligible

    s = State(state='random', subspace=sub, seed=3)
    sharded = kernel.sharded_fn(s.data)
    local = kernel._local_fn(jax.device_get(s.data))
    assert np.allclose(np.asarray(sharded), np.asarray(local), atol=1e-6)


def test_parity_sharded_evolution():
    """End-to-end evolve on a sharded Parity state."""
    from scipy.sparse.linalg import expm_multiply

    mesh = with_mesh(8)
    H = models.localized(L)
    H.allow_projection = True
    sub = Parity('even', L=L)
    H.add_subspace(sub)
    s = State(state='random', subspace=sub, seed=21)
    out = H.evolve(s, t=0.5)
    expected = expm_multiply(-0.5j * H.to_numpy(), s.to_numpy())
    assert np.max(np.abs(out.to_numpy() - expected)) < 1e-5
