"""
Uneven-sharding integration tests: subspace dimensions that do NOT divide
the device count must still shard (padded storage with a zero tail), on
power-of-two and non-power-of-two meshes. (The reference covers the
analogous generality with its mpirun -n 3 test leg,
run_all_tests.py:101-141, and PetscSplitOwnership row partitions,
bpetsc_template_2.c:232-235.)
"""

import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

from dynamite_tpu import config
from dynamite_tpu.parallel.mesh import make_mesh, storage_dim, AXIS
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, SpinConserve
from dynamite_tpu import models


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


def test_storage_dim():
    mesh = with_mesh(8)
    assert storage_dim(184756, mesh) == 184760  # C(20,10) over 8
    assert storage_dim(64, mesh) == 64
    assert storage_dim(20, mesh) == 24
    mesh = with_mesh(6)
    assert storage_dim(64, mesh) == 66
    with_mesh(1)
    assert storage_dim(20, config.mesh) == 20


def test_uneven_spinconserve_matvec():
    """C(6,3) = 20 rows over 8 devices: pads to 24, shards, matches numpy."""
    mesh = with_mesh(8)
    H = models.localized(6)
    sub = SpinConserve(6, 3)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_default()

    s = State(state='random', subspace=sub, seed=7)
    assert s.data.shape[-1] == 24
    assert s.data.sharding.spec == P(None, AXIS)
    got = H.dot(s)
    # pad invariant survives the apply
    raw = np.asarray(jax.device_get(got.data))
    assert np.all(raw[:, 20:] == 0)
    expected = H.to_numpy(subspaces=(sub, sub)) @ s.to_numpy()
    assert np.max(np.abs(got.to_numpy() - expected)) < 1e-5


def test_six_device_mesh():
    """Non-power-of-two device count: the XOR path is ineligible, so even
    the Full space takes the padded general path (2^8 does not divide 6)."""
    from scipy.sparse.linalg import expm_multiply

    mesh = with_mesh(6)
    L = 8
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert not kernel._xor_sharded_eligible
    assert kernel.sharded_default()

    s = State(state='random', subspace=sub, seed=11)
    assert s.data.shape[-1] == storage_dim(256, mesh) == 258
    out = H.evolve(s, t=0.4)
    expected = expm_multiply(-0.4j * H.to_numpy(), s.to_numpy())
    assert np.max(np.abs(out.to_numpy() - expected)) < 1e-5


def test_uneven_eigsolve_c20_10():
    """The VERDICT round-3 bar: eigsolve on C(20,10)=184756 over 8 virtual
    devices runs sharded by default and matches the sparse oracle."""
    from scipy.sparse.linalg import eigsh

    with_mesh(8)
    L = 20
    H = models.localized(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_default()

    evals = H.eigsolve(nev=1, subspace=sub)
    H_sp = H.to_numpy(subspaces=(sub, sub))
    expected = eigsh(H_sp, k=1, which='SA',
                     return_eigenvectors=False)
    assert abs(evals[0] - expected[0]) < 1e-5


def test_uneven_save_load_streamed(tmp_path):
    """Streamed (chunked) save/load round-trips on padded storage."""
    with_mesh(8)
    H = models.localized(6)
    sub = SpinConserve(6, 3)
    s = State(state='random', subspace=sub, seed=3)
    vec = s.to_numpy()

    old_chunk = State.SAVE_CHUNK
    State.SAVE_CHUNK = 7  # force many chunks over the 20-dim state
    try:
        s.save(str(tmp_path / 'chk'))
        loaded = State.from_file(str(tmp_path / 'chk'))
    finally:
        State.SAVE_CHUNK = old_chunk

    assert loaded.subspace == s.subspace
    assert np.max(np.abs(loaded.to_numpy() - vec)) < 1e-7
    raw = np.asarray(jax.device_get(loaded.data))
    assert raw.shape[-1] == 24 and np.all(raw[:, 20:] == 0)


def test_xparity_convert_device_roundtrip():
    """Device-side XParity conversion: child -> parent -> child is the
    identity and parent amplitudes obey the sector symmetry."""
    from dynamite_tpu.subspaces import XParity

    with_mesh(8)
    L = 6
    sub = XParity(Full(L=L), sector='+')
    s = State(state='random', subspace=sub, seed=9)
    parent = sub.convert_state(s)
    # sector symmetry: amp(flip(c)) = + amp(c)
    pv = parent.to_numpy()
    flip = (1 << L) - 1
    states = np.arange(1 << L)
    assert np.allclose(pv[states], pv[flip ^ states], atol=1e-6)
    back = sub.convert_state(parent)
    assert np.max(np.abs(back.to_numpy() - s.to_numpy())) < 1e-6
