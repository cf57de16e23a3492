"""
Unit tests for the State class (modeled on the reference's
tests/unit/test_states.py + integration state tests).
"""

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.states import State, UninitializedError
from dynamite_tpu.subspaces import Full, Parity, SpinConserve

L = 5


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


class TestInit:
    def test_str_to_state(self):
        assert State.str_to_state('UUUUU', 5) == 0
        assert State.str_to_state('DUUUU', 5) == 1
        assert State.str_to_state('UUUUD', 5) == 16
        assert State.str_to_state('10010', 5) == 0b01001
        assert State.str_to_state(7, 5) == 7
        with pytest.raises(ValueError):
            State.str_to_state('UUU', 5)
        with pytest.raises(ValueError):
            State.str_to_state('UUXUU', 5)
        with pytest.raises(ValueError):
            State.str_to_state(1 << 6, 5)

    def test_product(self):
        s = State(state='DUUUU')
        vec = s.to_numpy()
        assert vec[1] == 1
        assert np.count_nonzero(vec) == 1

    def test_product_int(self):
        s = State(state=5, L=L)
        assert s.to_numpy()[5] == 1

    def test_product_in_subspace(self):
        s = State(state='DDUUU', subspace=SpinConserve(L, 2))
        vec = s.to_numpy()
        assert np.count_nonzero(vec) == 1
        idx = int(np.flatnonzero(vec)[0])
        assert s.subspace.idx_to_state(idx) == 0b00011

    def test_product_outside_subspace(self):
        with pytest.raises(ValueError):
            State(state='DUUUU', subspace=SpinConserve(L, 2))

    def test_uniform(self):
        s = State(state='uniform', L=L)
        vec = s.to_numpy()
        assert np.allclose(vec, 1 / np.sqrt(2 ** L))

    def test_random_normalized(self):
        s = State(state='random', L=L, seed=0)
        assert abs(s.norm() - 1) < 1e-12

    def test_random_seed_reproducible(self):
        a = State(state='random', L=L, seed=42).to_numpy()
        b = State(state='random', L=L, seed=42).to_numpy()
        assert np.array_equal(a, b)

    def test_uninitialized(self):
        s = State(L=L)
        assert not s.initialized
        with pytest.raises(UninitializedError):
            s.assert_initialized()

    def test_set_all_by_function(self):
        s = State(subspace=Parity('even', L=L))
        s.set_all_by_function(lambda state: float(state % 3))
        states = s.subspace.idx_to_state(np.arange(len(s)))
        assert np.allclose(s.to_numpy(), states % 3)
        s2 = State(subspace=Parity('even', L=L))
        s2.set_all_by_function(lambda sts: (sts % 3).astype(float),
                               vectorize=True)
        assert np.array_equal(s.to_numpy(), s2.to_numpy())


class TestAlgebra:
    def test_dot_norm(self):
        a = State(state='random', L=L, seed=1)
        b = State(state='random', L=L, seed=2)
        expected = np.vdot(a.to_numpy(), b.to_numpy())
        assert abs(a.dot(b) - expected) < 1e-12
        assert abs(a.norm() - np.linalg.norm(a.to_numpy())) < 1e-12

    def test_scale(self):
        a = State(state='random', L=L, seed=1)
        vec = a.to_numpy()
        a.scale(2.5)
        assert np.allclose(a.to_numpy(), 2.5 * vec)
        a.scale(1j)
        assert np.allclose(a.to_numpy(), 2.5j * vec)

    def test_axpy(self):
        a = State(state='random', L=L, seed=1)
        b = State(state='random', L=L, seed=2)
        va, vb = a.to_numpy(), b.to_numpy()
        a.axpy(0.5j, b)
        assert np.allclose(a.to_numpy(), va + 0.5j * vb)

    def test_add_sub(self):
        a = State(state='random', L=L, seed=1)
        b = State(state='random', L=L, seed=2)
        va, vb = a.to_numpy(), b.to_numpy()
        assert np.allclose((a + b).to_numpy(), va + vb)
        assert np.allclose((a - b).to_numpy(), va - vb)
        assert np.allclose((2 * a).to_numpy(), 2 * va)
        assert np.allclose((a * 2).to_numpy(), 2 * va)

    def test_normalize(self):
        a = State(state='random', L=L, seed=1)
        a.scale(3.0)
        a.normalize()
        assert abs(a.norm() - 1) < 1e-12

    def test_copy(self):
        a = State(state='random', L=L, seed=1)
        b = a.copy()
        assert np.array_equal(a.to_numpy(), b.to_numpy())
        b.scale(2)
        assert abs(a.norm() - 1) < 1e-12  # a unchanged

    def test_subspace_mismatch(self):
        a = State(state='random', subspace=Parity('even', L=L), seed=1)
        b = State(state='random', subspace=Parity('odd', L=L), seed=1)
        with pytest.raises(ValueError):
            a.axpy(1.0, b)


class TestProject:
    def test_project(self):
        s = State(state='random', L=L, seed=3)
        s.project(2, 0)
        vec = s.to_numpy()
        idx = np.arange(2 ** L)
        assert np.all(vec[((idx >> 2) & 1) == 1] == 0)
        assert abs(np.linalg.norm(vec) - 1) < 1e-12

    def test_validation(self):
        s = State(state='random', L=L, seed=3)
        with pytest.raises(ValueError):
            s.project(L, 0)
        with pytest.raises(ValueError):
            s.project(0, 2)


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        s = State(state='random', subspace=SpinConserve(L, 2), seed=7)
        fname = str(tmp_path / 'state')
        s.save(fname)
        loaded = State.from_file(fname)
        assert loaded.subspace == s.subspace
        assert np.allclose(loaded.to_numpy(), s.to_numpy())


class TestStr:
    def test_product_str(self):
        s = State(state='01000', L=L)
        assert str(s) == '|01000>'

    def test_repr_uninitialized(self):
        s = State(L=L)
        assert 'uninitialized' in repr(s)
