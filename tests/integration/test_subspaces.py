"""
Subspace integration tests: Auto sector discovery against a brute-force
oracle, XParity state conversion round trips, dimension cross-checks and
embedding consistency (modeled on the reference's
tests/integration/test_subspaces.py).
"""

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import (Full, Parity, SpinConserve, Explicit,
                                    Auto, XParity)
from dynamite_tpu import models
from dynamite_tpu.operators import sigmax, sigmaz, index_sum

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def brute_force_sector(H, seed):
    """All states reachable from seed through nonzero matrix elements."""
    M = np.abs(np.asarray(H.to_numpy(subspaces=(Full(L=H.L),) * 2).todense()))
    seen = {seed}
    frontier = [seed]
    while frontier:
        nxt = []
        for s in frontier:
            for t in np.nonzero(M[:, s])[0]:
                if int(t) not in seen:
                    seen.add(int(t))
                    nxt.append(int(t))
        frontier = nxt
    return np.array(sorted(seen))


def test_auto_matches_brute_force():
    H = models.localized(L)
    seed = int('0b' + '01' * (L // 2), 2)
    sub = Auto(H, seed)
    expected = brute_force_sector(H, seed)
    assert np.array_equal(sub.idx_to_state(np.arange(sub.get_dimension())),
                          expected)
    # the U(1) sector equals SpinConserve at the same hamming weight
    sc = SpinConserve(L, bin(seed).count('1'))
    assert sub.get_dimension() == sc.get_dimension()


def test_auto_unsorted_is_permutation():
    H = models.localized(L)
    seed = 0b000111
    sorted_sub = Auto(H, seed, sort=True)
    bfs_sub = Auto(H, seed, sort=False)
    assert sorted_sub.get_dimension() == bfs_sub.get_dimension()
    a = sorted_sub.idx_to_state(np.arange(sorted_sub.get_dimension()))
    b = bfs_sub.idx_to_state(np.arange(bfs_sub.get_dimension()))
    assert np.array_equal(np.sort(a), np.sort(b))


def test_auto_str_seed():
    H = models.localized(L)
    sub_str = Auto(H, 'U' * (L // 2) + 'D' * (L // 2))
    sub_int = Auto(H, State.str_to_state('U' * (L // 2) + 'D' * (L // 2), L))
    assert sub_str.identical(sub_int)


def test_matvec_in_auto_subspace():
    """The kernel restricted to an Auto sector matches the oracle."""
    H = models.localized(L)
    sub = Auto(H, 0b000111)
    H.add_subspace(sub)
    s = State(state='random', subspace=sub, seed=3)
    expected = H.to_numpy() @ s.to_numpy()
    got = H.dot(s).to_numpy()
    assert np.allclose(got, expected, atol=1e-5)


def subspace_checksum_cases():
    return [
        (Full(L=L), Full(L=L), True),
        (Full(L=L), Full(L=L + 1), False),
        (Parity('even', L=L), Parity('even', L=L), True),
        (Parity('even', L=L), Parity('odd', L=L), False),
        (SpinConserve(L, 2), SpinConserve(L, 2), True),
        (SpinConserve(L, 2), SpinConserve(L, 3), False),
    ]


def test_equality_by_checksum():
    for a, b, eq in subspace_checksum_cases():
        assert (a == b) is eq


def test_explicit_equals_spinconserve_states():
    sc = SpinConserve(L, 2)
    states = sc.idx_to_state(np.arange(sc.get_dimension()))
    ex = Explicit(states, L=L)
    assert ex == sc  # equality is by state-map checksum
    assert not ex.identical(sc)  # but not identical (different types)


@pytest.mark.parametrize('parent_name,mk', [
    ('full', lambda: Full(L=L)),
    ('spinconserve_half', lambda: SpinConserve(L, L // 2)),
])
@pytest.mark.parametrize('sector', ['+', '-'])
def test_xparity_convert_roundtrip(parent_name, mk, sector):
    parent = mk()
    sub = XParity(parent, sector=sector, L=L)
    assert sub.get_dimension() == parent.get_dimension() // 2

    s = State(state='random', subspace=sub, seed=9)
    up = sub.convert_state(s)             # embed into the parent space
    assert up.subspace.identical(parent) or up.subspace == parent
    assert np.isclose(up.norm(), 1.0, atol=1e-6)
    back = sub.convert_state(up)
    fidelity = abs(complex(back.dot(s)))
    assert np.isclose(fidelity, 1.0, atol=1e-6)


def test_xparity_sectors_orthogonal():
    """+ and - sector states embed to orthogonal parent-space vectors."""
    sub_p = XParity(Full(L=L), sector='+')
    sub_m = XParity(Full(L=L), sector='-')
    plus = State(state='random', subspace=sub_p, seed=1)
    minus = State(state='random', subspace=sub_m, seed=1)
    vp = sub_p.convert_state(plus).to_numpy()
    vm = sub_m.convert_state(minus).to_numpy()
    assert abs(np.vdot(vp, vm)) < 1e-6


def test_xparity_eigenvalues_partition_spectrum():
    """TFIM commutes with global X-flip: the Full spectrum is the union of
    the two XParity sector spectra."""
    H = models.ising(L)
    full_evals = np.sort(np.linalg.eigvalsh(
        np.asarray(H.to_numpy(subspaces=(Full(L=L),) * 2).todense())))
    sector_evals = []
    for sector in ('+', '-'):
        sub = XParity(Full(L=L), sector=sector)
        M = np.asarray(H.to_numpy(subspaces=(sub, sub)).todense())
        sector_evals.append(np.linalg.eigvalsh(M))
    combined = np.sort(np.concatenate(sector_evals))
    assert np.allclose(full_evals, combined, atol=1e-8)


def test_spinconserve_dimension_and_maps():
    from math import comb
    for k in range(L + 1):
        sub = SpinConserve(L, k)
        d = sub.get_dimension()
        assert d == comb(L, k)
        states = sub.idx_to_state(np.arange(d))
        assert all(bin(int(s)).count('1') == k for s in states)
        back = sub.state_to_idx(states)
        assert np.array_equal(back, np.arange(d))
    # out-of-sector states map to -1
    sub = SpinConserve(L, 2)
    assert sub.state_to_idx(np.array([0b111]))[0] == -1


def test_parity_maps():
    for space, want in (('even', 0), ('odd', 1)):
        sub = Parity(space, L=L)
        d = sub.get_dimension()
        assert d == 1 << (L - 1)
        states = sub.idx_to_state(np.arange(d))
        pars = np.array([bin(int(s)).count('1') % 2 for s in states])
        assert np.all(pars == want)
        assert np.array_equal(sub.state_to_idx(states), np.arange(d))
        # opposite-parity states are invalid
        flipped = states ^ 1
        assert np.all(sub.state_to_idx(flipped) == -1)
