"""
Unit tests for the MSC representation — the format's executable spec
(modeled on the reference's tests/unit/test_msc_tools.py).
"""

import numpy as np
import pytest

from dynamite_tpu.ops import msc as m

X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)
I2 = np.eye(2, dtype=complex)


def op_at(op, i, L):
    """Matrix for a single-site operator at spin i (bit i convention)."""
    dim = 1 << L
    M = np.zeros((dim, dim), dtype=complex)
    for s in range(dim):
        b = (s >> i) & 1
        for bp in range(2):
            if op[bp, b] != 0:
                sp = (s & ~(1 << i)) | (bp << i)
                M[sp, s] += op[bp, b]
    return M


def dense(msc, L):
    return m.msc_to_matrix(msc, (1 << L, 1 << L), sparse=False)


class TestToMatrix:
    def test_sigmax(self):
        for L in (1, 3):
            for i in range(L):
                got = dense([(1 << i, 0, 1)], L)
                assert np.array_equal(got, op_at(X, i, L))

    def test_sigmay(self):
        for L in (1, 3):
            for i in range(L):
                got = dense([(1 << i, 1 << i, 1j)], L)
                assert np.array_equal(got, op_at(Y, i, L))

    def test_sigmaz(self):
        for L in (1, 3):
            for i in range(L):
                got = dense([(0, 1 << i, 1)], L)
                assert np.array_equal(got, op_at(Z, i, L))

    def test_identity(self):
        assert np.array_equal(dense([(0, 0, 1)], 2), np.eye(4))

    def test_zero(self):
        assert np.array_equal(dense(np.zeros(0, dtype=m.msc_dtype), 2),
                              np.zeros((4, 4)))

    def test_sum(self):
        got = dense([(1, 0, 0.5), (0, 1, -0.25)], 1)
        assert np.allclose(got, 0.5 * X - 0.25 * Z)

    def test_projection_semantics(self):
        # state_to_idx returning -1 drops the entry
        got = m.msc_to_matrix(
            [(1, 0, 1.0)], (2, 2),
            idx_to_state=lambda x: x,
            state_to_idx=lambda s: np.where(np.asarray(s) == 0, 0, -1),
            sparse=False)
        expected = np.zeros((2, 2), dtype=complex)
        expected[1, 0] = 1  # only row with bra==0 survives... row1: bra=1^1=0
        assert np.array_equal(got, expected)


class TestProduct:
    cases = [
        ('XX', [(1, 0, 1)], [(1, 0, 1)], I2),
        ('XY', [(1, 0, 1)], [(1, 1, 1j)], 1j * Z),
        ('YX', [(1, 1, 1j)], [(1, 0, 1)], -1j * Z),
        ('XZ', [(1, 0, 1)], [(0, 1, 1)], -1j * Y),
        ('ZX', [(0, 1, 1)], [(1, 0, 1)], 1j * Y),
        ('YZ', [(1, 1, 1j)], [(0, 1, 1)], 1j * X),
        ('ZY', [(0, 1, 1)], [(1, 1, 1j)], -1j * X),
        ('YY', [(1, 1, 1j)], [(1, 1, 1j)], I2),
        ('ZZ', [(0, 1, 1)], [(0, 1, 1)], I2),
    ]

    @pytest.mark.parametrize('name,a,b,expected',
                             cases, ids=[c[0] for c in cases])
    def test_pauli_products(self, name, a, b, expected):
        prod = m.msc_product([m.as_msc(a), m.as_msc(b)])
        assert np.allclose(dense(prod, 1), expected)

    def test_multi_site(self):
        a = m.as_msc([(1, 0, 1)])        # X0
        b = m.as_msc([(2, 2, 1j)])       # Y1
        prod = m.msc_product([a, b])
        got = dense(prod, 2)
        assert np.allclose(got, op_at(X, 0, 2) @ op_at(Y, 1, 2))

    def test_empty_factor(self):
        zero = np.zeros(0, dtype=m.msc_dtype)
        prod = m.msc_product([m.as_msc([(1, 0, 1)]), zero])
        assert prod.size == 0


class TestCombine:
    def test_merge(self):
        terms = m.as_msc([(1, 0, 1), (0, 1, 2), (1, 0, 3)])
        out = m.combine_terms(terms)
        assert len(out) == 2
        got = {(t['masks'], t['signs']): t['coeffs'] for t in out}
        assert got[(1, 0)] == 4
        assert got[(0, 1)] == 2

    def test_cancel(self):
        terms = m.as_msc([(1, 0, 1), (1, 0, -1)])
        assert len(m.combine_terms(terms)) == 0

    def test_sorted(self):
        terms = m.as_msc([(3, 0, 1), (1, 2, 1), (1, 0, 1)])
        out = m.combine_terms(terms)
        assert np.all(np.diff(out['masks']) >= 0)


class TestShift:
    def test_simple(self):
        shifted = m.shift(m.as_msc([(1, 2, 1)]), 2, None)
        assert shifted['masks'][0] == 4
        assert shifted['signs'][0] == 8

    def test_wrap(self):
        # mask at site 3, shift by 2 with wrap at 4 -> site 1
        shifted = m.shift(m.as_msc([(8, 0, 1)]), 2, 4)
        assert shifted['masks'][0] == 2

    def test_input_unmodified(self):
        orig = m.as_msc([(1, 2, 1)])
        m.shift(orig, 3, None)
        assert orig['masks'][0] == 1


class TestHermiticity:
    def test_hermitian(self):
        assert m.is_hermitian(m.as_msc([(1, 0, 1)]))       # X
        assert m.is_hermitian(m.as_msc([(1, 1, 1j)]))      # Y
        assert m.is_hermitian(m.as_msc([(0, 1, 1)]))       # Z

    def test_non_hermitian(self):
        assert not m.is_hermitian(m.as_msc([(1, 0, 1j)]))  # iX
        assert not m.is_hermitian(m.as_msc([(1, 1, 1)]))   # -iY


class TestSerialization:
    def test_roundtrip(self):
        msc = m.as_msc([(1, 0, 0.5), (6, 2, 1j), (0, 7, -2)])
        assert np.array_equal(m.deserialize(m.serialize(msc)), msc)

    def test_header(self):
        msc = m.as_msc([(1, 0, 1)])
        data = m.serialize(msc)
        assert data.startswith(b'1\n64\n')


class TestMisc:
    def test_max_spin_idx(self):
        assert m.max_spin_idx(m.as_msc([(4, 1, 1)])) == 2
        assert m.max_spin_idx(m.as_msc([(1, 8, 1)])) == 3
        assert m.max_spin_idx(np.zeros(0, dtype=m.msc_dtype)) == -1

    def test_nnz(self):
        msc = m.as_msc([(1, 0, 1), (1, 2, 1), (2, 0, 1)])
        assert m.nnz_per_row(msc) == 2

    def test_mask_groups(self):
        msc = m.combine_terms(m.as_msc([(1, 0, 1), (1, 2, 1), (2, 0, 1)]))
        masks, offsets = m.mask_groups(msc)
        assert list(masks) == [1, 2]
        assert list(offsets) == [0, 2, 3]

    def test_truncate(self):
        msc = m.as_msc([(1, 0, 1e-14), (2, 0, 1)])
        out = m.truncate(msc, 1e-12)
        assert len(out) == 1
        with pytest.raises(ValueError):
            m.truncate(msc, -1)

    def test_table(self):
        msc = m.as_msc([(1, 0, 0.5), (0, 2, 1.0)])
        tbl = m.table(msc, 2)
        assert 'X-' in tbl
        assert '-Z' in tbl
