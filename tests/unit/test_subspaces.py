"""
Unit tests for subspace index maps (modeled on the reference's
tests/unit/test_subspaces.py: dimensions and mappings computed two ways).
"""

import numpy as np
import pytest

from dynamite_tpu.subspaces import (Full, Parity, SpinConserve, Explicit,
                                    Auto, XParity)
from dynamite_tpu.utils.bitwise import popcount, parity


class TestFull:
    def test_dimension(self):
        for L in (1, 4, 10):
            assert Full(L=L).get_dimension() == 2 ** L

    def test_maps(self):
        s = Full(L=5)
        idx = np.arange(32)
        assert np.array_equal(s.idx_to_state(idx), idx)
        assert np.array_equal(s.state_to_idx(idx), idx)

    def test_out_of_bounds(self):
        s = Full(L=3)
        with pytest.raises(ValueError):
            s.idx_to_state(8)

    def test_equality(self):
        assert Full(L=4) == Full(L=4)
        assert Full(L=4) != Full(L=5)


class TestParity:
    @pytest.mark.parametrize('space', [0, 1])
    def test_roundtrip(self, space):
        for L in (2, 5):
            s = Parity(space, L=L)
            dim = s.get_dimension()
            assert dim == 2 ** (L - 1)
            states = s.idx_to_state(np.arange(dim))
            # all states have the right parity, are unique, and map back
            assert np.all(parity(states) == space)
            assert len(np.unique(states)) == dim
            assert np.array_equal(s.state_to_idx(states), np.arange(dim))

    def test_wrong_parity_state(self):
        s = Parity('even', L=4)
        assert s.state_to_idx(0b0001) == -1
        assert s.state_to_idx(0b0011) != -1

    def test_space_validation(self):
        assert Parity('even').space == 0
        assert Parity('odd').space == 1
        with pytest.raises(ValueError):
            Parity('sideways')


class TestSpinConserve:
    @pytest.mark.parametrize('L,k', [(4, 2), (6, 3), (8, 2), (7, 5)])
    def test_roundtrip(self, L, k):
        from math import comb
        s = SpinConserve(L, k)
        dim = s.get_dimension()
        assert dim == comb(L, k)
        states = s.idx_to_state(np.arange(dim))
        assert np.all(popcount(states) == k)
        assert len(np.unique(states)) == dim
        # states are emitted in sorted (combinatorial rank) order
        assert np.all(np.diff(states) > 0)
        assert np.array_equal(s.state_to_idx(states), np.arange(dim))

    def test_exhaustive_small(self):
        L, k = 5, 2
        s = SpinConserve(L, k)
        expected = sorted(x for x in range(2 ** L)
                          if bin(x).count('1') == k)
        got = s.idx_to_state(np.arange(s.get_dimension()))
        assert list(got) == expected

    def test_wrong_weight(self):
        s = SpinConserve(4, 2)
        assert s.state_to_idx(0b0001) == -1
        assert s.state_to_idx(0b0111) == -1

    def test_k_validation(self):
        with pytest.raises(ValueError):
            SpinConserve(4, 5)


class TestExplicit:
    def test_sorted_list(self):
        states = [0b00, 0b11, 0b101]
        s = Explicit(states, L=3)
        assert s.get_dimension() == 3
        assert np.array_equal(s.idx_to_state(np.arange(3)), states)
        assert np.array_equal(s.state_to_idx(np.array(states)),
                              np.arange(3))
        assert s.state_to_idx(0b10) == -1

    def test_unsorted_list(self):
        states = [0b101, 0b00, 0b11]
        s = Explicit(states, L=3)
        assert np.array_equal(s.idx_to_state(np.arange(3)), states)
        assert np.array_equal(s.state_to_idx(np.array(states)),
                              np.arange(3))

    def test_unique(self):
        with pytest.raises(ValueError):
            Explicit([1, 2, 1], L=2)

    def test_L_check(self):
        with pytest.raises(ValueError):
            Explicit([0b111], L=2)

    def test_equals_spinconserve(self):
        sc = SpinConserve(5, 2)
        ex = Explicit(sc.idx_to_state(np.arange(sc.get_dimension())), L=5)
        assert ex == sc


class TestAuto:
    def test_finds_spinconserve_sector(self):
        from dynamite_tpu.models import heisenberg
        H = heisenberg(6)
        auto = Auto(H, 'UUUDDD')
        sc = SpinConserve(6, 3)
        assert auto.get_dimension() == sc.get_dimension()
        assert auto == sc

    def test_nosort_is_same_set(self):
        from dynamite_tpu.models import heisenberg
        H = heisenberg(6)
        a1 = Auto(H, 'UUUDDD')
        a2 = Auto(H, 'UUUDDD', sort=False)
        assert set(a1.state_map) == set(a2.state_map)


class TestXParity:
    def test_dimension(self):
        s = XParity(Full(L=4))
        assert s.get_dimension() == 8

    def test_sector_validation(self):
        assert XParity(sector='+', L=4).sector == 1
        assert XParity(sector=-1, L=4).sector == -1
        with pytest.raises(ValueError):
            XParity(sector='x', L=4)

    def test_parent_validation(self):
        XParity(Parity('even', L=4))
        with pytest.raises(ValueError):
            XParity(Parity('even', L=5))
        XParity(SpinConserve(6, 3))
        with pytest.raises(ValueError):
            XParity(SpinConserve(6, 2))

    def test_reduce_msc_drops_noncommuting(self):
        from dynamite_tpu.ops.msc import as_msc
        s = XParity(Full(L=2))
        # single Z does not commute with XX
        out, conserved = s.reduce_msc(as_msc([(0, 1, 1)]),
                                      check_conserves=True)
        assert len(out) == 0
        assert not conserved

    def test_reduce_msc_folds(self):
        from dynamite_tpu.ops.msc import as_msc
        L = 3
        s_plus = XParity(Full(L=L), sector='+')
        s_minus = XParity(Full(L=L), sector='-')
        # X on the top spin folds to X on the bottom two spins
        msc = as_msc([(0b100, 0, 1.0)])
        out_p = s_plus.reduce_msc(msc)
        assert list(out_p['masks']) == [0b011]
        assert out_p['coeffs'][0] == 1.0
        out_m = s_minus.reduce_msc(msc)
        assert out_m['coeffs'][0] == -1.0
