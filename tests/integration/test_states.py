"""
State integration tests: initialization, projection measurement, save/load
round trips, seeded randomness, vector algebra (modeled on the reference's
tests/integration/test_states.py).
"""

import os
import tempfile

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


SUBSPACES = [
    ('full', lambda: Full(L=L)),
    ('parity_even', lambda: Parity('even', L=L)),
    ('spinconserve', lambda: SpinConserve(L, L // 2)),
]


@pytest.mark.parametrize('name,mk', SUBSPACES, ids=[s[0] for s in SUBSPACES])
def test_random_normalized_and_seeded(name, mk):
    a = State(state='random', subspace=mk(), seed=42)
    b = State(state='random', subspace=mk(), seed=42)
    c = State(state='random', subspace=mk(), seed=43)
    va, vb, vc = a.to_numpy(), b.to_numpy(), c.to_numpy()
    assert np.isclose(np.linalg.norm(va), 1.0, atol=1e-6)
    assert np.allclose(va, vb)
    assert not np.allclose(va, vc)


def test_uniform():
    s = State(state='uniform', subspace=Full(L=L))
    v = s.to_numpy()
    assert np.allclose(v, v[0])
    assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-6)


def test_product_states():
    # 'U'/'D' and '0'/'1' conventions: character i -> spin L-1-i, U/0 = bit 0
    s = State(state='U' * L, subspace=Full(L=L))
    v = s.to_numpy()
    assert np.isclose(abs(v[0]), 1.0)

    s = State(state='D' * L, subspace=Full(L=L))
    v = s.to_numpy()
    assert np.isclose(abs(v[(1 << L) - 1]), 1.0)

    idx = 0b001011
    s = State(state=idx, subspace=Full(L=L))
    v = s.to_numpy()
    assert np.isclose(abs(v[idx]), 1.0)
    assert np.isclose(np.linalg.norm(v), 1.0)


def test_product_state_in_spinconserve():
    sub = SpinConserve(L, L // 2)
    state_int = int('0b' + '0' * (L // 2) + '1' * (L // 2), 2)
    s = State(state=state_int, subspace=sub)
    v = s.to_numpy()
    idx = int(sub.state_to_idx(np.array([state_int]))[0])
    assert idx >= 0
    assert np.isclose(abs(v[idx]), 1.0)


@pytest.mark.parametrize('name,mk', SUBSPACES, ids=[s[0] for s in SUBSPACES])
def test_save_load_roundtrip(name, mk, tmp_path):
    s = State(state='random', subspace=mk(), seed=7)
    fname = os.path.join(str(tmp_path), 'state.dnm')
    s.save(fname)
    r = State.from_file(fname)
    assert r.subspace.identical(s.subspace)
    assert np.allclose(r.to_numpy(), s.to_numpy())


def test_project():
    s = State(state='random', subspace=Full(L=L), seed=1)
    v = s.to_numpy()
    for spin, val in ((0, 0), (2, 1)):
        p = s.copy()
        p.project(spin, val)
        w = p.to_numpy()
        idx = np.arange(1 << L)
        keepers = ((idx >> spin) & 1) == val
        assert np.allclose(w[~keepers], 0)
        expected = np.where(keepers, v, 0)
        expected /= np.linalg.norm(expected)
        assert np.allclose(w, expected, atol=1e-6)


def test_set_all_by_function():
    sub = Full(L=L)
    s = State(subspace=sub)
    s.set_all_by_function(lambda st: float(bin(int(st)).count('1')))
    v = s.to_numpy()
    expected = np.array([bin(k).count('1') for k in range(1 << L)],
                        dtype=np.complex128)
    assert np.allclose(v, expected, atol=1e-6)


def test_algebra():
    a = State(state='random', subspace=Full(L=L), seed=2)
    b = State(state='random', subspace=Full(L=L), seed=3)
    va, vb = a.to_numpy(), b.to_numpy()

    assert np.isclose(complex(a.dot(b)), np.vdot(va, vb), atol=1e-6)
    assert np.isclose(a.norm(), np.linalg.norm(va), atol=1e-6)

    c = a + b
    assert np.allclose(c.to_numpy(), va + vb, atol=1e-6)
    c = a - b
    assert np.allclose(c.to_numpy(), va - vb, atol=1e-6)
    c = 2.5 * a
    assert np.allclose(c.to_numpy(), 2.5 * va, atol=1e-6)

    d = a.copy()
    d.axpy(1j, b)
    assert np.allclose(d.to_numpy(), va + 1j * vb, atol=1e-6)

    e = a.copy()
    e.scale_and_sum(2.0, -0.5, b)  # y = alpha*x + beta*y
    assert np.allclose(e.to_numpy(), 2.0 * vb - 0.5 * va, atol=1e-6)

    f = a.copy()
    f.normalize()
    assert np.isclose(f.norm(), 1.0, atol=1e-6)


def test_subspace_mismatch_raises():
    a = State(state='random', subspace=Full(L=L), seed=0)
    b = State(state='random', subspace=Parity('even', L=L), seed=0)
    with pytest.raises(ValueError):
        a.dot(b)


def test_str_repr():
    s = State(state='U' * L, subspace=Full(L=L))
    assert 'U' * L in str(s) or '|' in str(s)
    r = repr(s)
    assert 'State' in r
