"""
Operator integration tests: conservation checks against a matrix oracle,
expectation values, operator save/load round trips, memory estimates
(modeled on the reference's tests/integration/test_operators.py).
"""

import os

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.operators import sigmax, sigmay, sigmaz, index_sum, op_sum
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve
from dynamite_tpu import models

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def oracle_conserves(H, sub):
    """H conserves sub iff P_out H P_in == H P_in in the full space."""
    M = np.asarray(H.to_numpy(subspaces=(Full(L=H.L),) * 2).todense())
    inside = np.zeros(1 << H.L, dtype=bool)
    inside[sub.idx_to_state(np.arange(sub.get_dimension()))] = True
    HP = M[:, inside]
    return not np.any(np.abs(HP[~inside, :]) > 1e-12)


CASES = [
    # (model, subspace factory, expected to conserve)
    ('heisenberg_sz', lambda: models.localized(L),
     lambda: SpinConserve(L, L // 2), True),
    ('ising_sz', lambda: models.ising(L),
     lambda: SpinConserve(L, L // 2), False),
    ('ising_parity', lambda: models.ising(L),
     lambda: Parity('even', L=L), False),  # transverse field flips parity
    ('zz_parity', lambda: index_sum(sigmaz(0) * sigmaz(1), size=L),
     lambda: Parity('even', L=L), True),
    ('xx_parity', lambda: index_sum(sigmax(0) * sigmax(1), size=L),
     lambda: Parity('odd', L=L), True),
    ('x_parity', lambda: index_sum(sigmax(), size=L),
     lambda: Parity('even', L=L), False),
]


@pytest.mark.parametrize('name,mkH,mksub,expected',
                         CASES, ids=[c[0] for c in CASES])
def test_conserves(name, mkH, mksub, expected):
    H = mkH()
    H.L = L
    sub = mksub()
    assert oracle_conserves(H, sub) is expected  # oracle sanity
    assert H.conserves(sub) is expected


def test_build_refuses_nonconserved():
    H = models.ising(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    with pytest.raises(ValueError):
        H.build_mat()
    H.allow_projection = True
    H.build_mat()  # now fine


def test_expectation():
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    s = State(state='random', subspace=sub, seed=4)
    v = s.to_numpy()
    M = np.asarray(H.to_numpy().todense())
    expected = np.vdot(v, M @ v)
    assert np.isclose(complex(H.expectation(s)), expected, atol=1e-5)


def test_save_load_roundtrip(tmp_path):
    for H in (models.ising(L), models.long_range(L),
              models.syk(L // 2)):
        H.L = L
        fname = os.path.join(str(tmp_path), 'op.dnm')
        H.save(fname)
        from dynamite_tpu.operators import Operator
        G = Operator.load(fname)
        assert G.L is None or G.L == H.L
        G.L = H.L
        assert np.array_equal(np.sort(G.msc, order=['masks', 'signs']),
                              np.sort(H.msc, order=['masks', 'signs']))


def test_serialize_byte_compat():
    """Serialization follows the reference wire format (32-byte header line
    + big-endian mask/sign/coeff blobs, msc_tools.py:276-365)."""
    H = models.ising(4)
    data = H.serialize()
    assert isinstance(data, bytes)
    header = data.split(b'\n')[0]
    assert b'32' in data or header  # int-size field present
    from dynamite_tpu.operators import Operator
    G = Operator.from_bytes(data)
    assert np.array_equal(G.msc['masks'], H.msc['masks'])
    assert np.array_equal(G.msc['signs'], H.msc['signs'])
    assert np.allclose(G.msc['coeffs'], H.msc['coeffs'])


def test_estimate_memory_positive():
    H = models.localized(L)
    est = H.estimate_memory()
    assert est > 0


def test_dot_requires_matching_subspace():
    H = models.localized(L)
    H.add_subspace(Full(L=L))
    s = State(state='random', subspace=SpinConserve(L, 2), seed=0)
    with pytest.raises(Exception):
        H.dot(s)


def test_scale_and_algebra_against_numpy():
    H1 = models.ising(L)
    H2 = index_sum(sigmay(), size=L)
    M1 = np.asarray(H1.to_numpy(subspaces=(Full(L=L),) * 2).todense())
    M2 = np.asarray(H2.to_numpy(subspaces=(Full(L=L),) * 2).todense())

    for op, m in (((H1 + H2), M1 + M2),
                  ((H1 - H2), M1 - M2),
                  ((2.5 * H1), 2.5 * M1),
                  ((H1 * H2), M1 @ M2),
                  ((-H1), -M1),
                  ((H1 / 2), M1 / 2)):
        got = np.asarray(op.to_numpy(subspaces=(Full(L=L),) * 2).todense())
        assert np.allclose(got, m, atol=1e-10)


def test_infinity_norm_cache_invalidation():
    """Norm changes when the operator is scaled in place."""
    H = models.ising(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    n1 = H.infinity_norm()
    H.scale(2.0)
    n2 = H.infinity_norm()
    assert np.isclose(n2, 2 * n1, rtol=1e-10)
