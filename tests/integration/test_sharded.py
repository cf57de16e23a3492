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
    local = jax.jit(kernel.traceable(sharded=False))(
        jax.device_get(s.data))
    assert np.allclose(np.asarray(sharded), np.asarray(local), atol=1e-6)


@pytest.mark.parametrize('ndev', [4, 8])
def test_sharded_eigsolve(ndev):
    """eigsolve must run distributed (reference bar: SLEPc EPS over
    distributed Vecs, computations.py:230-257): the Lanczos iteration runs
    over the sharded matvec and matches the dense oracle."""
    with_mesh(ndev)
    Lx = 8
    H = models.localized(Lx)
    sub = Full(L=Lx)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_default()

    evals, evecs = H.eigsolve(nev=4, getvecs=True, subspace=sub)
    expected = np.sort(np.linalg.eigvalsh(H.to_numpy().toarray()))
    assert len(evals) >= 4  # nconv >= nev, like the reference
    assert np.allclose(evals, expected[:len(evals)], atol=1e-8)
    # the computed eigenvectors live sharded on the mesh and satisfy the
    # eigenvalue equation
    for lam, v in zip(evals, evecs):
        assert v.data.sharding.spec == P(None, AXIS)
        resid = H.dot(v)
        resid.axpy(-lam, v)
        assert resid.norm() < 1e-7


def test_sharded_eigsolve_spinconserve():
    """The general (all-gather) sharded path through eigsolve."""
    with_mesh(4)
    H = models.localized(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_default()

    evals = H.eigsolve(nev=2, subspace=sub)
    expected = np.sort(np.linalg.eigvalsh(
        H.to_numpy(subspaces=(sub, sub)).toarray()))
    assert len(evals) >= 2
    assert np.allclose(evals, expected[:len(evals)], atol=1e-8)


def test_sharded_target_eigsolve():
    """Shift-invert (MINRES inner solve) over the sharded matvec."""
    with_mesh(4)
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    dense = np.linalg.eigvalsh(H.to_numpy().toarray())
    mid = len(dense) // 2
    target = float(0.7 * dense[mid] + 0.3 * dense[mid + 1])
    evals = H.eigsolve(nev=1, target=target)
    closest = dense[np.argmin(np.abs(dense - target))]
    assert abs(evals[0] - closest) < 1e-7


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
