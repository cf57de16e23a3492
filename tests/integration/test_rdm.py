"""
Reduced-density-matrix integration tests against a direct partial-trace
oracle (modeled on the reference's tests/integration/test_rdm.py; the
reference computes the RDM with a gather-to-rank-0 outer-product loop,
bpetsc_template_1.c:87-165 — here it is a transpose + matmul).
"""

from itertools import combinations

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve
from dynamite_tpu.computations import (reduced_density_matrix,
                                       entanglement_entropy)

L = 5


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def oracle_rdm(full_vec, keep, L):
    """Direct partial trace: rho[r, r'] = sum_t psi[s(r,t)] conj(psi[s(r',t)])
    with s built by placing r's bits at the kept positions and t's bits at
    the traced positions."""
    keep = list(keep)
    traced = [i for i in range(L) if i not in keep]
    k = len(keep)
    dim_k, dim_t = 1 << k, 1 << len(traced)
    rho = np.zeros((dim_k, dim_k), dtype=np.complex128)

    def embed(r, t):
        s = 0
        for j, b in enumerate(keep):
            s |= ((r >> j) & 1) << b
        for j, b in enumerate(traced):
            s |= ((t >> j) & 1) << b
        return s

    for r in range(dim_k):
        for rp in range(dim_k):
            for t in range(dim_t):
                rho[r, rp] += (full_vec[embed(r, t)]
                               * np.conj(full_vec[embed(rp, t)]))
    return rho


def embed_full(state):
    """Scatter a subspace state's amplitudes into the full 2**L space."""
    amps = state.to_numpy()
    full = np.zeros(1 << state.L, dtype=np.complex128)
    idxs = state.subspace.idx_to_state(np.arange(len(amps)))
    full[idxs] = amps
    return full


SUBSPACES = [
    ('full', lambda: Full(L=L)),
    ('parity_even', lambda: Parity('even', L=L)),
    ('parity_odd', lambda: Parity('odd', L=L)),
    ('spinconserve', lambda: SpinConserve(L, 2)),
]


@pytest.mark.parametrize('name,mk', SUBSPACES, ids=[s[0] for s in SUBSPACES])
@pytest.mark.parametrize('keep', [(0,), (0, 1), (2, 4), (1, 2, 3),
                                  tuple(range(L))])
def test_rdm_oracle(name, mk, keep):
    sub = mk()
    s = State(state='random', subspace=sub, seed=11)
    got = reduced_density_matrix(s, keep)
    expected = oracle_rdm(embed_full(s), keep, L)
    assert np.allclose(got, expected, atol=1e-6)
    # a valid density matrix: trace 1, hermitian, PSD
    assert np.isclose(np.trace(got).real, 1.0, atol=1e-6)
    assert np.allclose(got, got.conj().T, atol=1e-10)
    assert np.min(np.linalg.eigvalsh(got)) > -1e-8


def test_keep_all_is_pure():
    s = State(state='random', subspace=Full(L=L), seed=3)
    rho = reduced_density_matrix(s, list(range(L)))
    v = s.to_numpy()
    assert np.allclose(rho, np.outer(v, v.conj()), atol=1e-6)


def test_product_state_zero_entropy():
    s = State(state='U' * L, subspace=Full(L=L))
    for keep in combinations(range(L), 2):
        assert abs(entanglement_entropy(s, keep)) < 1e-8


def test_complement_symmetry():
    """S(A) == S(B) for a pure state split A|B."""
    s = State(state='random', subspace=Full(L=L), seed=5)
    keep = [0, 2]
    comp = [i for i in range(L) if i not in keep]
    assert np.isclose(entanglement_entropy(s, keep),
                      entanglement_entropy(s, comp), atol=1e-6)


@pytest.mark.parametrize('name,mk', SUBSPACES, ids=[s[0] for s in SUBSPACES])
def test_device_matches_host(name, mk):
    """The on-mesh transpose+matmul against the host numpy path directly."""
    from dynamite_tpu.ops.rdm import rdm_device, rdm_host
    s = State(state='random', subspace=mk(), seed=21)
    for keep in [(0,), (1, 3), (0, 1, 2)]:
        assert np.allclose(rdm_device(s, keep), rdm_host(s, keep), atol=1e-6)


def test_rdm_sharded_mesh():
    """RDM of a state sharded over the 8-device mesh: the scatter,
    transpose, and V V^dagger contraction all run on the mesh (reference
    bar to beat: rank-0 serial rdm, bpetsc_template_1.c:87-165)."""
    from jax.sharding import PartitionSpec as P
    from dynamite_tpu.parallel.mesh import make_mesh, AXIS

    config._initialize()
    saved = config.mesh
    try:
        config._mesh = make_mesh(mesh_shape=(8,))
        Lx = 8
        s = State(state='random', subspace=Full(L=Lx), seed=7)
        assert s.data.sharding.spec == P(None, AXIS)
        got = reduced_density_matrix(s, [0, 3, 5])
        expected = oracle_rdm(s.to_numpy(), [0, 3, 5], Lx)
        assert np.allclose(got, expected, atol=1e-6)

        # subspace scatter path on the mesh
        sp = State(state='random', subspace=Parity('even', L=Lx), seed=9)
        got = reduced_density_matrix(sp, [1, 2])
        expected = oracle_rdm(embed_full(sp), [1, 2], Lx)
        assert np.allclose(got, expected, atol=1e-6)
    finally:
        config._mesh = saved


def test_rdm_errors():
    s = State(state='random', subspace=Full(L=L), seed=0)
    with pytest.raises(ValueError):
        reduced_density_matrix(s, [1, 0])     # not increasing
    with pytest.raises(ValueError):
        reduced_density_matrix(s, [-1])
    empty = reduced_density_matrix(s, [])
    assert empty.shape == (1, 1)
