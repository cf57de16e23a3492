"""
The memory-scaling distributed sector engine (ops/sector_shard.py): the
shard_map ring program must match the local sector engine and the numpy
oracle for every channel family (row/col/cross/diag), on even and uneven
meshes, plain and XParity-wrapped, in single and double precision — and its
per-device resident memory must be O(dim/n_devices), unlike the reference's
multi-GPU allgather (bcuda_template_2.cu:164-171).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dynamite_tpu import config
from dynamite_tpu.parallel.mesh import make_mesh, AXIS, device_put_state, \
    storage_dim
from dynamite_tpu.subspaces import SpinConserve, XParity
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


def _check(H, sub, mesh, rtol=2e-5):
    """Sharded ring apply vs the local apply and the numpy oracle."""
    H = H.copy()
    H.allow_projection = True
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    dim = sub.get_dimension()

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, dim)).astype(config.real_dtype)

    fn = kernel.traceable(sharded=True)
    assert kernel.sector_plan is not None, 'sector engine did not engage'

    xd = device_put_state(x, mesh, dim)
    got = np.asarray(fn(xd))
    # pad tail must remain exactly zero
    assert not np.any(got[:, dim:])
    got = got[:, :dim]

    local = np.asarray(kernel.traceable(sharded=False)(jnp.asarray(x)))
    scale = max(np.abs(local).max(), 1e-30)
    assert np.abs(got - local).max() / scale < rtol

    Hnp = H.to_numpy()
    xc = x[0] + 1j * x[1]
    expected = Hnp @ xc
    gotc = got[0] + 1j * got[1]
    scale = max(np.abs(expected).max(), 1e-30)
    assert np.abs(gotc - expected).max() / scale < rtol


@pytest.mark.parametrize('nd', [3, 8])
@pytest.mark.parametrize('Lk', [(8, 4), (9, 4), (10, 3)])
def test_heisenberg_ring(nd, Lk):
    L, k = Lk
    mesh = with_mesh(nd)
    _check(models.heisenberg(L), SpinConserve(L, k), mesh)


def test_mbl_diag_and_cross():
    """localized() has diagonal (mask 0) terms and boundary hops — the
    diag stream and cross channels under the ring."""
    L = 8
    mesh = with_mesh(8)
    _check(models.localized(L, seed=3), SpinConserve(L, L // 2), mesh)


def test_long_range_many_groups():
    """long_range() carries O(L^2) mask groups: many simultaneous row and
    col channel families."""
    L = 8
    mesh = with_mesh(4)
    _check(models.long_range(L), SpinConserve(L, L // 2), mesh)


def test_xparity_wrapped():
    L = 8
    mesh = with_mesh(4)
    sub = XParity(SpinConserve(L, L // 2), sector=1)
    _check(models.heisenberg(L), sub, mesh)


def test_double_default_tight():
    """The suite runs at the default double precision; the ring engine must
    hit f64-grade agreement with the dense oracle."""
    L = 8
    mesh = with_mesh(8)
    _check(models.heisenberg(L), SpinConserve(L, L // 2), mesh,
           rtol=1e-12)


def test_solver_integration():
    """Ground state through the ring engine matches the dense solve."""
    from dynamite_tpu.computations import eigsolve
    L = 10
    mesh = with_mesh(8)
    H = models.heisenberg(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    assert kernel.sharded_default()
    evals = eigsolve(H, nev=1)
    dense = np.linalg.eigvalsh(H.to_numpy(sparse=False))
    assert abs(evals[0] - dense[0]) < 1e-4 * max(1.0, abs(dense[0]))
    assert kernel.sector_plan is not None


def test_memory_scales_with_devices():
    """Per-device temp memory of the compiled sharded apply is
    O(dim/n_devices): the whole point of the ring program. (The round-4
    GSPMD path measured ~4.4x the FULL input per device at L=20/8dev —
    per-device temps *grew* toward more devices; here they must halve.)"""
    L = 16

    def temps(nd):
        config._mesh = make_mesh(mesh_shape=(nd,))
        mesh = config.mesh
        H = models.heisenberg(L)
        sub = SpinConserve(L, L // 2)
        H.add_subspace(sub)
        kernel = H.get_mat(subspaces=(sub, sub))
        dim = sub.get_dimension()
        x = device_put_state(
            np.zeros((2, dim), dtype=config.real_dtype), mesh, dim)
        fn = kernel.sharded_fn
        compiled = jax.jit(lambda v: fn(v)).lower(x).compile()
        sdim = storage_dim(dim, mesh)
        state_bytes = 2 * sdim * np.dtype(config.real_dtype).itemsize
        return compiled.memory_analysis().temp_size_in_bytes, state_bytes

    config._initialize()
    t4, state = temps(4)
    t8, _ = temps(8)
    # doubling the devices must substantially shrink per-device temps
    assert t8 < 0.7 * t4, (t4, t8)
    # and the absolute budget is a constant number of (dim/nd)-sized ring
    # buffers per device (measured ~12), nowhere near the allgather floor
    # of one full state per device
    assert t8 < 16 * state / 8 + (1 << 16), (t8, state)


def test_ring_general_path():
    """The memory-scaling ring variant of the general scan path (forced
    via config.sharded_ring_general) matches the all-gather variant and
    the oracle — exercised on a many-group operator with the sector and
    ELL engines disabled so the scan path is what runs."""
    L = 8
    mesh = with_mesh(8)
    config.sharded_ring_general = True
    config.use_sector = False
    config.use_ell = False
    try:
        H = models.syk(L).copy()
        H.allow_projection = True
        sub = SpinConserve(L, L // 2)
        H.add_subspace(sub)
        kernel = H.get_mat(subspaces=(sub, sub))
        assert kernel.plan.use_scan
        dim = sub.get_dimension()
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, dim)).astype(config.real_dtype)
        xd = device_put_state(x, mesh, dim)
        got = np.asarray(kernel.traceable(sharded=True)(xd))[:, :dim]
        local = np.asarray(
            kernel.traceable(sharded=False)(jnp.asarray(x)))
        scale = max(np.abs(local).max(), 1e-30)
        assert np.abs(got - local).max() / scale < 1e-10
    finally:
        config.sharded_ring_general = None
        config.use_sector = True
        config.use_ell = True
