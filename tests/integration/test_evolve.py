"""
Time evolution against scipy's expm_multiply (the reference's oracle:
tests/integration/test_evolve.py:54).
"""

import numpy as np
import pytest
import scipy.sparse.linalg

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve
from dynamite_tpu import models
from dynamite_tpu.computations import MaxIterationsError

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def check_evolve(H, sub, t, tol=1e-9, **kwargs):
    H = H.copy()
    H.add_subspace(sub)
    s = State(state='random', seed=10, subspace=sub)
    got = H.evolve(s, t=t, **kwargs).to_numpy()
    Hnp = H.to_numpy().tocsc()
    expected = scipy.sparse.linalg.expm_multiply(-1j * t * Hnp, s.to_numpy())
    assert np.max(np.abs(got - expected)) < tol


def test_ising_full():
    check_evolve(models.ising(L), Full(L=L), 1.0)


def test_negative_time():
    check_evolve(models.ising(L), Full(L=L), -0.7)


def test_long_time():
    check_evolve(models.localized(L), Full(L=L), 20.0, tol=1e-7)


def test_parity():
    H = models.heisenberg(L)
    check_evolve(H, Parity('even', L=L), 1.5)


def test_spinconserve():
    H = models.heisenberg(L)
    check_evolve(H, SpinConserve(L, L // 2), 2.0)


def test_imaginary_time():
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    s = State(state='random', seed=2, subspace=sub)
    # exp(-beta H): t = -i*beta
    beta = 0.8
    got = H.evolve(s, t=-1j * beta).to_numpy()
    expected = scipy.sparse.linalg.expm_multiply(
        -beta * H.to_numpy().tocsc(), s.to_numpy())
    assert np.max(np.abs(got - expected)) < 1e-9


def test_t_zero():
    H = models.ising(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    s = State(state='random', seed=4, subspace=sub)
    r = H.evolve(s, t=0.0)
    assert np.array_equal(r.to_numpy(), s.to_numpy())


def test_result_state_reuse():
    H = models.ising(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    s = State(state='random', seed=4, subspace=sub)
    result = State(subspace=sub)
    out = H.evolve(s, t=0.3, result=result)
    assert out is result
    assert result.initialized


def test_max_iterations_error():
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    s = State(state='random', seed=4, subspace=sub)
    with pytest.raises(MaxIterationsError):
        H.evolve(s, t=100.0, max_its=1)


def test_subspace_mismatch():
    H = models.ising(L)
    s = State(state='random', seed=4, subspace=Parity('even', L=L))
    with pytest.raises(ValueError):
        H.evolve(s, t=1.0)
