"""
Unit tests for the Operator class and factories (modeled on the reference's
tests/unit/test_operators.py: algebra checked against numpy).
"""

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.operators import (Operator, sigmax, sigmay, sigmaz,
                                    sigma_plus, sigma_minus, identity, zero,
                                    op_sum, op_product, index_sum,
                                    index_product)
from dynamite_tpu.extras import commutator, majorana


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def dense(op, L=None):
    if L is not None:
        op = op.copy()
        op.L = L
    return op.to_numpy(sparse=False)


X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)


class TestFactories:
    def test_paulis(self):
        assert np.array_equal(dense(sigmax(), 1), X)
        assert np.array_equal(dense(sigmay(), 1), Y)
        assert np.array_equal(dense(sigmaz(), 1), Z)

    def test_plus_minus(self):
        assert np.array_equal(dense(sigma_plus(), 1), X + 1j * Y)
        assert np.array_equal(dense(sigma_minus(), 1), X - 1j * Y)

    def test_identity_zero(self):
        assert np.array_equal(dense(identity(), 2), np.eye(4))
        assert np.array_equal(dense(zero(), 2), np.zeros((4, 4)))


class TestAlgebra:
    def test_add(self):
        got = dense(sigmax() + sigmaz(), 1)
        assert np.array_equal(got, X + Z)

    def test_scalar_add(self):
        got = dense(sigmax() + 2, 1)
        assert np.array_equal(got, X + 2 * np.eye(2))
        got = dense(2 + sigmax(), 1)
        assert np.array_equal(got, X + 2 * np.eye(2))

    def test_sub(self):
        assert np.array_equal(dense(sigmax() - sigmaz(), 1), X - Z)

    def test_scale(self):
        assert np.array_equal(dense(2.5 * sigmax(), 1), 2.5 * X)
        assert np.array_equal(dense(sigmax() / 2, 1), X / 2)

    def test_mul(self):
        assert np.allclose(dense(sigmax() * sigmay(), 1), X @ Y)

    def test_neg(self):
        assert np.array_equal(dense(-sigmax(), 1), -X)

    def test_equality(self):
        assert sigmax() * sigmay() == op_product([sigmax(), sigmay()])
        assert sigmax() + sigmay() == op_sum([sigmax(), sigmay()])
        assert not sigmax() == sigmay()

    def test_op_sum_combines(self):
        op = op_sum([sigmax(), sigmax()])
        assert op.nterms == 1

    def test_commutator(self):
        got = dense(commutator(sigmax(), sigmay()), 1)
        assert np.allclose(got, X @ Y - Y @ X)


class TestIndexOps:
    def test_index_sum_open(self):
        L = 4
        op = index_sum(sigmaz(0) * sigmaz(1), size=L)
        expected_terms = L - 1
        assert op.nterms == expected_terms

    def test_index_sum_closed(self):
        L = 4
        op = index_sum(sigmaz(0) * sigmaz(1), size=L, boundary='closed')
        assert op.nterms == L

    def test_index_sum_size_too_small(self):
        with pytest.raises(ValueError):
            index_sum(sigmaz(0) * sigmaz(1), size=1)

    def test_index_product(self):
        L = 3
        op = index_product(sigmaz(), size=L)
        got = dense(op, L)
        expected = np.diag([(-1) ** bin(i).count('1') for i in range(8)])
        assert np.array_equal(got, expected)

    def test_majorana_anticommute(self):
        for i, j in [(0, 1), (1, 2), (0, 3)]:
            a, b = majorana(i), majorana(j)
            anti = a * b + b * a
            anti.reduce_msc()
            assert anti.nterms == 0
        sq = majorana(2) * majorana(2)
        assert sq == identity()


class TestLengthAndDims:
    def test_L_propagation(self):
        config.L = 5
        op = sigmax(0)
        assert op.L == 5
        assert op.dim == (32, 32)

    def test_establish_L(self):
        op = sigmax(3)
        assert op.L is None
        op.establish_L()
        assert op.L == 4

    def test_L_too_small(self):
        op = sigmax(3)
        with pytest.raises(ValueError):
            op.L = 2

    def test_max_spin_idx(self):
        assert (sigmax(2) * sigmaz(5)).max_spin_idx == 5

    def test_nnz_density(self):
        op = sigmax(0) + sigmaz(0)
        op.L = 2
        assert op.nnz == 2
        assert op.density == 0.5


class TestSerialization:
    def test_roundtrip(self, tmp_path):
        op = index_sum(sigmaz(0) * sigmaz(1), size=5) + \
            0.3 * index_sum(sigmay(), size=5)
        fname = str(tmp_path / 'op.dnm')
        op.save(fname)
        loaded = Operator.load(fname)
        assert loaded == op

    def test_bytes_roundtrip(self):
        op = sigmax() + 2 * sigmaz()
        assert Operator.from_bytes(op.serialize()) == op


class TestStringRep:
    def test_str(self):
        assert str(sigmax(2)) == 'σx[2]'
        assert repr(sigmay(1)) == 'sigmay(1)'

    def test_sum_str(self):
        s = str(sigmax() + sigmay())
        assert 'σx[0]' in s and 'σy[0]' in s

    def test_latex(self):
        assert 'sigma^x' in sigmax()._repr_latex_()

    def test_table(self):
        op = sigmax(0) + sigmay(1)
        op.L = 2
        tbl = op.table()
        assert 'X-' in tbl
        assert '-Y' in tbl


class TestConserves:
    def test_full_always(self):
        from dynamite_tpu.subspaces import Full
        op = sigmax(0)
        op.L = 3
        assert op.conserves(Full(L=3))

    def test_parity(self):
        from dynamite_tpu.subspaces import Parity
        op = sigmaz(0) * sigmaz(1) + sigmax(0) * sigmax(1)
        op.L = 3
        assert op.conserves(Parity('even', L=3))
        flip = sigmax(0)
        flip.L = 3
        assert not flip.conserves(Parity('even', L=3))

    def test_spinconserve(self):
        from dynamite_tpu.subspaces import SpinConserve
        from dynamite_tpu.models import heisenberg
        H = heisenberg(4)
        assert H.conserves(SpinConserve(4, 2))
        from dynamite_tpu.models import ising
        assert not ising(4).conserves(SpinConserve(4, 2))

    def test_projection_gate(self):
        from dynamite_tpu.subspaces import SpinConserve
        from dynamite_tpu.models import ising
        H = ising(4)
        H.add_subspace(SpinConserve(4, 2))
        with pytest.raises(ValueError):
            H.build_mat()
        H.allow_projection = True
        H.build_mat()
