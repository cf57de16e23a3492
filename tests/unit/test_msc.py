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


class TestToMatrixSpec:
    """Literal-matrix fixtures pinning the MSC matrix semantics (the wire
    format's executable spec; reference: tests/unit/test_msc_tools.py's
    ToNumpy class)."""

    def test_diag_signs_L4(self):
        # sign bit i reads out spin i: alternation period doubles per bit
        assert np.array_equal(dense([(0, 1, 1)], 4),
                              np.diag([1., -1] * 8))
        assert np.array_equal(dense([(0, 3, 1)], 4),
                              np.diag([1., -1, -1, 1] * 4))
        assert np.array_equal(dense([(0, 8, 1)], 4),
                              np.diag([1.] * 8 + [-1.] * 8))
        assert np.array_equal(dense([(0, 9, 1)], 4),
                              np.diag([1., -1] * 4 + [-1., 1] * 4))

    def test_allflip_L4(self):
        # mask of all ones = anti-diagonal identity
        assert np.array_equal(dense([(15, 0, 1)], 4), np.eye(16)[:, ::-1])

    def test_imag_coeff_diag(self):
        assert np.array_equal(dense([(0, 0, 1j)], 1), 1j * np.eye(2))

    def test_imag_coeff_offdiag(self):
        assert np.array_equal(dense([(1, 0, 1j)], 1), 1j * X)

    def test_imag_coeff_signed(self):
        # (1, 1, 1j) is sigma_y: entry (-1)**parity(sign & bra) * 1j
        assert np.array_equal(dense([(1, 1, 1j)], 1), Y)

    def test_two_terms_L3(self):
        got = dense([(1, 5, 0.5j), (4, 3, -2)], 3)
        expected = (0.5j * (op_at(Y, 0, 3) @ op_at(Z, 2, 3)) / 1j
                    - 2 * (op_at(X, 2, 3) @ op_at(Z, 0, 3) @ op_at(Z, 1, 3)))
        assert np.array_equal(got, expected)
        # spot-check a few literal entries
        assert got[0, 1] == -0.5j
        assert got[1, 0] == 0.5j
        assert got[0, 4] == -2
        assert got[1, 5] == 2
        assert got[3, 7] == -2

    def test_rectangular_wide(self):
        # fewer rows than columns: the left map only exposes 3 row states
        got = m.msc_to_matrix([(0, 0, 1)], (3, 5), sparse=False)
        assert np.array_equal(got, np.eye(5)[:3, :])

    def test_rectangular_tall(self):
        # state_to_idx maps states >= 3 out of the right subspace
        def s2i(x):
            x = np.asarray(x).copy()
            x[x >= 3] = -1
            return x
        got = m.msc_to_matrix([(0, 0, 1)], (5, 3), state_to_idx=s2i,
                              sparse=False)
        assert np.array_equal(got, np.eye(5)[:, :3])

    def test_projection_zero_rows(self):
        def s2i(x):
            x = np.asarray(x).copy()
            x[x >= 3] = -1
            return x
        got = m.msc_to_matrix([(0, 0, 1)], (5, 5), state_to_idx=s2i,
                              sparse=False)
        expected = np.zeros((5, 5))
        expected[:3, :3] = np.eye(3)
        assert np.array_equal(got, expected)

    def test_row_map(self):
        # XOR row relabeling permutes rows
        got = m.msc_to_matrix([(1, 5, 0.5j), (4, 3, -2)], (8, 8),
                              idx_to_state=lambda x: np.asarray(x) ^ 4,
                              sparse=False)
        base = dense([(1, 5, 0.5j), (4, 3, -2)], 3)
        perm = np.arange(8) ^ 4
        assert np.array_equal(got, base[perm, :])

    def test_col_map(self):
        # XOR column relabeling permutes columns
        got = m.msc_to_matrix([(1, 5, 0.5j), (4, 3, -2)], (8, 8),
                              state_to_idx=lambda x: np.asarray(x) ^ 4,
                              sparse=False)
        base = dense([(1, 5, 0.5j), (4, 3, -2)], 3)
        perm = np.arange(8) ^ 4
        # entry at (r, s2i(bra)): moving col c to c^4 = right-permute
        inv = np.empty(8, dtype=int)
        inv[perm] = np.arange(8)
        assert np.array_equal(got, base[:, inv])

    def test_both_maps(self):
        got = m.msc_to_matrix([(1, 5, 0.5j), (4, 3, -2)], (8, 8),
                              idx_to_state=lambda x: np.asarray(x) ^ 2,
                              state_to_idx=lambda x: np.asarray(x) ^ 4,
                              sparse=False)
        base = dense([(1, 5, 0.5j), (4, 3, -2)], 3)
        rperm = np.arange(8) ^ 2
        cinv = np.empty(8, dtype=int)
        cinv[np.arange(8) ^ 4] = np.arange(8)
        assert np.array_equal(got, base[rperm, :][:, cinv])

    def test_sparse_matches_dense(self):
        msc = [(1, 5, 0.5j), (4, 3, -2), (0, 6, 0.25)]
        sp_mat = m.msc_to_matrix(msc, (8, 8), sparse=True)
        assert np.array_equal(sp_mat.toarray(), dense(msc, 3))

    def test_blocking_invariance(self):
        # the row-block sweep must not affect the result
        msc = [(3, 1, 1.5), (0, 2, -1j)]
        a = m.msc_to_matrix(msc, (16, 16), sparse=False, block=3)
        b = m.msc_to_matrix(msc, (16, 16), sparse=False, block=4096)
        assert np.array_equal(a, b)


class TestSumSpec:
    def test_single(self):
        a = m.as_msc([(1, 0, 1)])
        assert np.array_equal(m.msc_sum([a]), a)

    def test_preserves_duplicates(self):
        # msc_sum concatenates; combining is a separate step
        a = m.as_msc([(1, 0, 1)])
        s = m.msc_sum([a, a])
        assert len(s) == 2

    def test_generator_input(self):
        s = m.msc_sum(m.as_msc([(i, 0, 1)]) for i in range(1, 4))
        assert list(s['masks']) == [1, 2, 3]

    def test_empty(self):
        s = m.msc_sum([])
        assert s.size == 0 and s.dtype == m.msc_dtype


class TestProductSpec:
    def test_empty_factor_list_is_identity(self):
        p = m.msc_product([])
        assert np.allclose(dense(p, 1), I2)

    def test_single(self):
        a = m.as_msc([(1, 1, 1j)])
        assert np.array_equal(m.msc_product([a]), a)

    def test_three_factors_distributes(self):
        # (X0) * (Y0 + Z1) * (X1) against the dense oracle
        f1 = m.as_msc([(1, 0, 1)])
        f2 = m.as_msc([(1, 1, 1j), (0, 2, 1)])
        f3 = m.as_msc([(2, 0, 1)])
        got = dense(m.msc_product([f1, f2, f3]), 2)
        expected = (op_at(X, 0, 2)
                    @ (op_at(Y, 0, 2) + op_at(Z, 1, 2))
                    @ op_at(X, 1, 2))
        assert np.allclose(got, expected)

    def test_cross_term_count(self):
        f1 = m.as_msc([(1, 0, 1), (0, 1, 1)])
        f2 = m.as_msc([(2, 0, 1), (0, 2, 1), (2, 2, 1j)])
        assert len(m.msc_product([f1, f2])) == 6

    def test_associativity(self):
        a = m.as_msc([(1, 0, 1), (1, 1, 1j)])
        b = m.as_msc([(0, 1, 0.5)])
        c = m.as_msc([(3, 2, -1)])
        ab_c = m.msc_product([m.msc_product([a, b]), c])
        a_bc = m.msc_product([a, m.msc_product([b, c])])
        assert np.allclose(dense(m.combine_terms(ab_c), 2),
                           dense(m.combine_terms(a_bc), 2))


class TestCombineSpec:
    def test_zero_sum_of_opposites(self):
        out = m.combine_terms(m.as_msc([(5, 3, 2 + 1j), (5, 3, -2 - 1j)]))
        assert out.size == 0

    def test_matrix_preserved(self):
        rng = np.random.RandomState(4)
        terms = [(int(rng.randint(8)), int(rng.randint(8)),
                  complex(rng.randn(), rng.randn())) for _ in range(20)]
        combined = m.combine_terms(m.as_msc(terms))
        assert np.allclose(dense(combined, 3), dense(terms, 3))
        # result is sorted and unique on (mask, sign)
        keys = list(zip(combined['masks'], combined['signs']))
        assert keys == sorted(keys) and len(set(keys)) == len(keys)

    def test_empty(self):
        assert m.combine_terms(np.zeros(0, dtype=m.msc_dtype)).size == 0


class TestShiftSpec:
    def test_sign_only(self):
        s = m.shift(m.as_msc([(0, 4, 1)]), 3, None)
        assert s['signs'][0] == 32 and s['masks'][0] == 0

    def test_multiple_terms(self):
        s = m.shift(m.as_msc([(1, 2, 1), (4, 1, 1j)]), 1, None)
        assert list(s['masks']) == [2, 8]
        assert list(s['signs']) == [4, 2]

    def test_sign_wrap(self):
        # sign at site 3 shifted by 2 with wrap at 4 lands on site 1
        s = m.shift(m.as_msc([(0, 8, 1)]), 2, 4)
        assert s['signs'][0] == 2

    def test_straddling_wrap(self):
        # mask 0b1100 (sites 2,3) shifted by 3 with wrap at 5:
        # site 2 -> 5 wraps to 0, site 3 -> 6 wraps to 1
        s = m.shift(m.as_msc([(12, 0, 1)]), 3, 5)
        assert s['masks'][0] == 0b00011

    def test_matrix_equivalence(self):
        # shifting then materializing == materializing on shifted sites
        base = m.as_msc([(1, 3, 1j)])
        shifted = m.shift(base, 2, None)
        got = dense(shifted, 4)
        expected = (op_at(Y, 2, 4) @ op_at(Z, 3, 4))
        assert np.allclose(got, expected)


class TestTruncateSpec:
    def test_zero_tol_keeps_nonzero(self):
        msc = m.as_msc([(1, 0, 0.0), (2, 0, 1e-300)])
        out = m.truncate(msc, 0)
        assert list(out['masks']) == [2]

    def test_empty(self):
        assert m.truncate(np.zeros(0, dtype=m.msc_dtype), 1e-3).size == 0

    def test_boundary_exclusive(self):
        # |coeff| == tol is dropped (strict inequality)
        msc = m.as_msc([(1, 0, 0.5), (2, 0, 0.75)])
        out = m.truncate(msc, 0.5)
        assert list(out['masks']) == [2]


def _expected_blob(masks, signs, coeffs, int_bits):
    """Independently construct the reference wire format: ASCII header
    '<nterms>\\n<int_bits>\\n', then big-endian masks, signs, coeffs."""
    idt = np.dtype(np.int32 if int_bits == 32 else np.int64).newbyteorder('B')
    cdt = np.dtype(np.complex128).newbyteorder('B')
    return (f'{len(masks)}\n{int_bits}\n'.encode()
            + np.asarray(masks, idt).tobytes()
            + np.asarray(signs, idt).tobytes()
            + np.asarray(coeffs, cdt).tobytes())


class TestSerializationSpec:
    def test_literal_bytes_64(self):
        msc = m.as_msc([(1, 5, -0.2j), (0, 1, 2)])
        assert m.serialize(msc) == _expected_blob(
            [1, 0], [5, 1], [-0.2j, 2], 64)

    def test_deserialize_32bit_blob(self):
        # a 32-bit blob (as written by a 32-bit reference build) must load
        blob = _expected_blob([1, 0], [5, 1], [-0.2j, 2], 32)
        msc = m.deserialize(blob)
        assert list(msc['masks']) == [1, 0]
        assert list(msc['signs']) == [5, 1]
        assert list(msc['coeffs']) == [-0.2j, 2]
        assert msc.dtype == m.msc_dtype

    def test_deserialize_64bit_blob(self):
        blob = _expected_blob([1 << 40, 3], [0, 1 << 62], [1.5, -2j], 64)
        msc = m.deserialize(blob)
        assert list(msc['masks']) == [1 << 40, 3]
        assert list(msc['signs']) == [0, 1 << 62]

    def test_bad_int_size(self):
        with pytest.raises(ValueError):
            m.deserialize(b'1\n16\n' + b'\x00' * 20)

    def test_empty_roundtrip(self):
        empty = np.zeros(0, dtype=m.msc_dtype)
        out = m.deserialize(m.serialize(empty))
        assert out.size == 0

    def test_large_L_roundtrip(self):
        # L = 62: masks past the int32 range survive the trip
        msc = m.as_msc([(1 << 61, (1 << 62) | 1, 0.5 - 0.25j)])
        out = m.deserialize(m.serialize(msc))
        assert np.array_equal(out, msc)


class TestTableSpec:
    def test_identity(self):
        tbl = m.table(m.as_msc([(0, 0, 1)]), 2)
        assert '--' in tbl and 'coeff' in tbl

    def test_y_coefficient_folding(self):
        # the encoded 1j is display-folded into the Y character
        tbl = m.table(m.as_msc([(1, 1, 1j)]), 1)
        lines = tbl.splitlines()
        assert any('Y' in ln and '1.000' in ln and 'j' not in ln
                   for ln in lines[2:])

    def test_multi_site_string(self):
        tbl = m.table(m.as_msc([(0b101, 0b110, 1j)]), 3)
        # site 0: X, site 1: Z, site 2: Y (mask&sign)
        assert 'XZY' in tbl


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
