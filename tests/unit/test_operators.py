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


class TestAlgebraDense:
    """Operator algebra against dense numpy on multi-site chains."""

    def op2(self, i, L):
        M = np.eye(1, dtype=complex)
        for j in range(L):
            M = np.kron({i: X}.get(j, np.eye(2)), M)
        return M

    def site(self, P, i, L):
        """Dense matrix of P acting on site i (bit i = fastest index)."""
        M = np.eye(1, dtype=complex)
        for j in range(L):
            M = np.kron(P if j == i else np.eye(2), M)
        return M

    def test_sum_distinct_sites(self):
        got = dense(sigmax(0) + sigmay(2), 3)
        assert np.array_equal(got, self.site(X, 0, 3) + self.site(Y, 2, 3))

    def test_product_distinct_sites(self):
        got = dense(sigmax(0) * sigmaz(2), 3)
        assert np.allclose(got, self.site(X, 0, 3) @ self.site(Z, 2, 3))

    def test_hopping(self):
        got = dense(sigma_plus(0) * sigma_minus(1)
                    + sigma_minus(0) * sigma_plus(1), 2)
        sp = X + 1j * Y
        sm = X - 1j * Y
        expected = (self.site(sp, 0, 2) @ self.site(sm, 1, 2)
                    + self.site(sm, 0, 2) @ self.site(sp, 1, 2))
        assert np.allclose(got, expected)

    def test_product_of_sums_distributes(self):
        a = sigmax(0) + sigmay(0)
        b = sigmaz(1) + sigmax(1)
        got = dense(a * b, 2)
        expected = ((self.site(X, 0, 2) + self.site(Y, 0, 2))
                    @ (self.site(Z, 1, 2) + self.site(X, 1, 2)))
        assert np.allclose(got, expected)

    def test_scalar_sub_both_sides(self):
        assert np.array_equal(dense(sigmaz() - 1, 1), Z - np.eye(2))
        assert np.array_equal(dense(1 - sigmaz(), 1), np.eye(2) - Z)

    def test_complex_scale(self):
        got = dense((0.5 - 0.25j) * sigmay(), 1)
        assert np.allclose(got, (0.5 - 0.25j) * Y)

    def test_square_of_sum(self):
        op = sigmax(0) + sigmaz(0)
        got = dense(op * op, 1)
        assert np.allclose(got, (X + Z) @ (X + Z))


class TestAlgebraErrors:
    def test_divide_by_operator(self):
        with pytest.raises(TypeError):
            sigmax() / sigmaz()

    def test_divide_number_by_operator(self):
        with pytest.raises(TypeError):
            2 / sigmax()

    def test_scale_by_nonnumber(self):
        with pytest.raises(TypeError):
            sigmax() * 'two'

    def test_mismatched_L(self):
        a = sigmax(0)
        a.L = 3
        b = sigmax(0)
        b.L = 4
        with pytest.raises(ValueError):
            a + b

    def test_mismatched_subspace(self):
        from dynamite_tpu.subspaces import Parity
        a = sigmaz(0) * sigmaz(1)
        a.add_subspace(Parity('even', L=3))
        b = sigmaz(0) * sigmaz(1)
        b.L = 3
        with pytest.raises(ValueError):
            a + b

    def test_equality_non_operator(self):
        with pytest.raises(TypeError):
            sigmax() == 5

    def test_spin_index_bounds(self):
        for factory in (sigmax, sigmay, sigmaz, sigma_plus, sigma_minus):
            with pytest.raises(ValueError):
                factory(63)
            with pytest.raises(ValueError):
                factory(-1)

    def test_translation_size_bounds(self):
        with pytest.raises(ValueError):
            index_sum(sigmax(), size=64)
        with pytest.raises(ValueError):
            index_product(sigmax(), size=64)


class TestIndexSumSpec:
    """index_sum term-level fixtures (MSC literal expectations)."""

    def msc_set(self, op):
        op.reduce_msc()
        return {(int(t['masks']), int(t['signs']), complex(t['coeffs']))
                for t in op.msc}

    def test_zero_summand(self):
        assert index_sum(zero(), size=5).nterms == 0

    def test_size_one(self):
        got = self.msc_set(index_sum(sigmax(), size=1))
        assert got == {(1, 0, 1)}

    def test_size_one_start(self):
        got = self.msc_set(index_sum(sigmax(), size=1, start=2))
        assert got == {(4, 0, 1)}

    def test_single_site_sweep(self):
        got = self.msc_set(index_sum(sigmax(), size=4))
        assert got == {(1 << i, 0, 1) for i in range(4)}

    def test_start_offsets_sites(self):
        got = self.msc_set(index_sum(sigmax(), size=3, start=2))
        assert got == {(4, 0, 1), (8, 0, 1), (16, 0, 1)}

    def test_two_site_open(self):
        got = self.msc_set(index_sum(sigmaz(0) * sigmaz(1), size=4))
        assert got == {(0, 0b0011, 1), (0, 0b0110, 1), (0, 0b1100, 1)}

    def test_two_site_closed_wraps(self):
        got = self.msc_set(index_sum(sigmaz(0) * sigmaz(1), size=4,
                                     boundary='closed'))
        assert got == {(0, 0b0011, 1), (0, 0b0110, 1), (0, 0b1100, 1),
                       (0, 0b1001, 1)}

    def test_mask_wraps_too(self):
        got = self.msc_set(index_sum(sigmax(0) * sigmax(1), size=3,
                                     boundary='closed'))
        assert got == {(0b011, 0, 1), (0b110, 0, 1), (0b101, 0, 1)}

    def test_autosize_from_L(self):
        op = sigmay(0)
        op.L = 3
        got = self.msc_set(index_sum(op))
        assert got == {(1, 1, 1j), (2, 2, 1j), (4, 4, 1j)}

    def test_no_size_no_L(self):
        with pytest.raises(ValueError):
            index_sum(sigmax())

    def test_closed_with_start(self):
        with pytest.raises(ValueError):
            index_sum(sigmax(), size=4, start=1, boundary='closed')

    def test_bad_boundary(self):
        with pytest.raises(ValueError):
            index_sum(sigmax(), size=4, boundary='periodic')

    def test_size_zero(self):
        with pytest.raises(ValueError):
            index_sum(sigmaz(), size=0)

    def test_gap_operator_too_big(self):
        with pytest.raises(ValueError):
            index_sum(sigmaz(0) + sigmaz(4), size=3)


class TestIndexProductSpec:
    def msc_set(self, op):
        op.reduce_msc()
        return {(int(t['masks']), int(t['signs']), complex(t['coeffs']))
                for t in op.msc}

    def test_size_one(self):
        assert self.msc_set(index_product(sigmax(), size=1)) == {(1, 0, 1)}

    def test_size_one_start(self):
        got = self.msc_set(index_product(sigmax(), size=1, start=2))
        assert got == {(4, 0, 1)}

    def test_all_x_string(self):
        got = self.msc_set(index_product(sigmax(), size=5))
        assert got == {(31, 0, 1)}

    def test_start_shifts_string(self):
        got = self.msc_set(index_product(sigmax(), size=5, start=1))
        assert got == {(62, 0, 1)}

    def test_two_site_factor(self):
        got = self.msc_set(index_product(sigmaz(0) + sigmaz(1), size=3))
        assert got == {(0, 0b011, 1), (0, 0b101, 1), (0, 0, 1),
                       (0, 0b110, 1)}

    def test_autosize_from_L(self):
        op = sigmaz(0) + sigmaz(1)
        op.L = 3
        got = self.msc_set(index_product(op))
        assert got == {(0, 0b011, 1), (0, 0b101, 1), (0, 0, 1),
                       (0, 0b110, 1)}

    def test_size_zero_is_identity(self):
        assert index_product(sigmaz(), size=0) == identity()

    def test_gap_operator_too_big(self):
        with pytest.raises(ValueError):
            index_product(sigmaz(0) + sigmaz(4), size=3)

    def test_zero_factor(self):
        assert index_product(zero(), size=5).nterms == 0


class TestOpSumSpec:
    def test_empty(self):
        assert op_sum([]).nterms == 0

    def test_single(self):
        assert op_sum([sigmay(1)]) == sigmay(1)

    def test_generator(self):
        got = op_sum(sigmax(i) for i in range(10))
        assert got == index_sum(sigmax(), size=10)

    def test_repeat_combines(self):
        got = op_sum([sigmaz(0)] * 7)
        got.reduce_msc()
        assert got.nterms == 1
        assert got.msc['coeffs'][0] == 7


class TestOpProductSpec:
    def test_empty_is_identity(self):
        assert op_product([]) == identity()

    def test_single(self):
        assert op_product([sigmaz(2)]) == sigmaz(2)

    def test_order_matters(self):
        xy = op_product([sigmax(0), sigmay(0)])
        yx = op_product([sigmay(0), sigmax(0)])
        assert not xy == yx
        assert np.allclose(dense(xy, 1), X @ Y)
        assert np.allclose(dense(yx, 1), Y @ X)


class TestTextRendering:
    def test_sum_parenthesized_in_product(self):
        s = str((sigmax() + sigmay()) * sigmaz(1))
        assert s.startswith('(')

    def test_atom_unparenthesized(self):
        assert '(' not in str(sigmax(0) * sigmaz(1))

    def test_repr_evaluates(self):
        ns = dict(sigmax=sigmax, sigmay=sigmay, sigmaz=sigmaz,
                  index_sum=index_sum, index_product=index_product,
                  sigma_plus=sigma_plus, sigma_minus=sigma_minus,
                  identity=identity, zero=zero)
        for op in (sigmax(2),
                   sigmax(0) * sigmay(1),
                   sigmax() + sigmay() + sigmaz(),
                   index_sum(sigmax(0) * sigmax(1), size=5),
                   index_product(sigmaz(), size=3),
                   index_sum(sigmay(), size=4, boundary='closed')):
            assert eval(repr(op), ns) == op  # noqa: S307

    def test_scaled_repr(self):
        r = repr(3 * sigmax(1))
        assert '3' in r and 'sigmax(1)' in r

    def test_index_sum_tex_has_sum_symbol(self):
        tex = index_sum(sigmax(), size=4)._repr_latex_()
        assert '\\sum' in tex and '{i}' in tex

    def test_nested_index_sum_distinct_vars(self):
        tex = index_sum(index_sum(sigmaz(0) * sigmaz(1), size=3),
                        size=3)._repr_latex_()
        assert '{j' in tex  # a second summation variable appears

    def test_sum_ellipsis(self):
        s = str(op_sum([sigmax(i) for i in range(10)]))
        assert '...' in s
        # but the repr lists every term
        r = repr(op_sum([sigmax(i) for i in range(10)]))
        assert r.count('sigmax') == 10


class TestCopySemantics:
    def test_copy_is_independent(self):
        a = sigmax(0) + sigmay(1)
        a.L = 3
        b = a.copy()
        b.scale(2)
        assert not a == b
        assert a.msc['coeffs'][0] == 1

    def test_copy_preserves_subspaces(self):
        from dynamite_tpu.subspaces import Parity
        a = sigmaz(0) * sigmaz(1)
        a.add_subspace(Parity('odd', L=3))
        b = a.copy()
        assert any(isinstance(left, Parity)
                   for left, right in b.get_subspace_list())

    def test_copy_preserves_flags(self):
        a = sigmax(0)
        a.L = 2
        a.allow_projection = True
        assert a.copy().allow_projection


class TestShiftedMSC:
    def test_get_shifted_msc(self):
        op = sigmax(0) * sigmaz(1)
        shifted = op.get_shifted_msc(2, wrap_idx=None)
        assert shifted['masks'][0] == 4
        assert shifted['signs'][0] == 8

    def test_get_shifted_msc_wrap(self):
        op = sigmax(0) * sigmax(1)
        shifted = op.get_shifted_msc(3, wrap_idx=4)
        assert shifted['masks'][0] == 0b1001


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
