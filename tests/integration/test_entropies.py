"""
Reduced density matrices and entropies, checked against a direct einsum
oracle (the reference checks against QuTiP-generated golden data;
tests/integration/generate_dm_tests.py).
"""

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve
from dynamite_tpu.computations import (reduced_density_matrix,
                                       entanglement_entropy,
                                       dm_entanglement_entropy,
                                       renyi_entropy, dm_renyi_entropy)

L = 5


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def rdm_oracle(full_vec, keep, L):
    """Direct density-matrix trace via einsum over the [2]*L tensor."""
    keep = list(keep)
    traced = [i for i in range(L) if i not in keep]
    psi = full_vec.reshape([2] * L)
    # tensor axis a <-> bit (L-1-a); row index bit j of rho = spin keep[j]
    perm = ([L - 1 - b for b in reversed(keep)]
            + [L - 1 - b for b in reversed(traced)])
    V = np.transpose(psi, perm).reshape(2 ** len(keep), -1)
    return V @ V.conj().T


def embed(state):
    vec = np.zeros(2 ** state.L, dtype=complex)
    idx = state.subspace.idx_to_state(np.arange(len(state)))
    vec[idx] = state.to_numpy()
    return vec


def test_product_state_rdm():
    s = State(state='UUDDU', subspace=Full(L=L))
    rho = reduced_density_matrix(s, [0, 1])
    expected = np.zeros((4, 4))
    expected[0, 0] = 1  # spins 0,1 are both U (0)
    assert np.allclose(rho, expected)
    # pure product state: zero entanglement
    assert abs(entanglement_entropy(s, [0, 1])) < 1e-12


def test_random_state_rdm_full():
    s = State(state='random', seed=3, subspace=Full(L=L))
    for keep in ([0], [0, 1], [1, 3], [0, 2, 4], list(range(L))):
        rho = reduced_density_matrix(s, keep)
        expected = rdm_oracle(s.to_numpy(), keep, L)
        assert np.allclose(rho, expected)
        assert abs(np.trace(rho).real - 1) < 1e-10


def test_rdm_subspaces():
    for sub in (Parity('even', L=L), SpinConserve(L, 2)):
        s = State(state='random', seed=5, subspace=sub)
        rho = reduced_density_matrix(s, [0, 1])
        expected = rdm_oracle(embed(s), [0, 1], L)
        assert np.allclose(rho, expected)


def test_keep_empty():
    s = State(state='random', seed=1, subspace=Full(L=L))
    assert np.array_equal(reduced_density_matrix(s, []),
                          np.array([[1]], dtype=complex))


def test_keep_validation():
    s = State(state='random', seed=1, subspace=Full(L=L))
    with pytest.raises(ValueError):
        reduced_density_matrix(s, [1, 1])
    with pytest.raises(ValueError):
        reduced_density_matrix(s, [-1])


def test_bell_entropy():
    # (|00> + |11>)/sqrt(2): entanglement entropy log(2)
    vec = np.zeros(4, dtype=complex)
    vec[0b00] = vec[0b11] = 1 / np.sqrt(2)
    s = State(subspace=Full(L=2))
    s.set_all_numpy(vec)
    assert abs(s.entanglement_entropy([0]) - np.log(2)) < 1e-12


def test_entropy_symmetry():
    # S(A) == S(B) for a pure state
    s = State(state='random', seed=9, subspace=Full(L=L))
    sA = entanglement_entropy(s, [0, 1])
    sB = entanglement_entropy(s, [2, 3, 4])
    assert abs(sA - sB) < 1e-10


def test_dm_entropy_formulas():
    # maximally mixed 2x2: S = log 2, renyi_alpha = log 2 for all alpha
    dm = np.eye(2) / 2
    assert abs(dm_entanglement_entropy(dm) - np.log(2)) < 1e-12
    for alpha in (0, 1, 2, 0.5, 'inf'):
        assert abs(dm_renyi_entropy(dm, alpha) - np.log(2)) < 1e-12


def test_renyi_on_state():
    s = State(state='random', seed=13, subspace=Full(L=L))
    rho = reduced_density_matrix(s, [0, 1])
    w = np.linalg.eigvalsh(rho)
    expected = np.log(np.sum(w ** 2)) / (1 - 2)
    assert abs(renyi_entropy(s, [0, 1], 2) - expected) < 1e-10
    # matrix_power method agrees
    assert abs(dm_renyi_entropy(rho, 2, method='matrix_power')
               - expected) < 1e-10
    with pytest.raises(TypeError):
        dm_renyi_entropy(rho, 1.5, method='matrix_power')
