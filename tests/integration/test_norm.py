"""
Infinity-norm integration tests against the scipy oracle (modeled on the
reference's tests/integration/test_norm.py; the reference computes the norm
in the shell-matrix kernel with Kahan summation, bpetsc_template_2.c:906-981).
"""

import numpy as np
import pytest

from dynamite_tpu import config
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


MODELS = [
    ('ising', models.ising),
    ('long_range', models.long_range),
    ('localized', models.localized),
    ('syk', lambda L: models.syk(L // 2)),
]


def oracle_inf_norm(H, sub):
    M = np.abs(np.asarray(H.to_numpy(subspaces=(sub, sub)).todense()))
    return np.max(M.sum(axis=1))


@pytest.mark.parametrize('name,builder', MODELS, ids=[m[0] for m in MODELS])
def test_full(name, builder):
    H = builder(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    got = H.infinity_norm()
    assert np.isclose(got, oracle_inf_norm(H, sub), rtol=1e-6)


@pytest.mark.parametrize('space', ['even', 'odd'])
def test_parity(space):
    H = models.ising(L)
    H.allow_projection = True
    sub = Parity(space, L=L)
    H.add_subspace(sub)
    got = H.infinity_norm(subspaces=(sub, sub))
    assert np.isclose(got, oracle_inf_norm(H, sub), rtol=1e-6)


def test_spinconserve():
    H = models.localized(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    got = H.infinity_norm(subspaces=(sub, sub))
    assert np.isclose(got, oracle_inf_norm(H, sub), rtol=1e-6)


@pytest.mark.parametrize('name,builder', MODELS, ids=[m[0] for m in MODELS])
def test_device_matches_host(name, builder):
    """The device reduction against the host numpy sweep directly."""
    H = builder(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    assert np.isclose(H.infinity_norm(), H._infinity_norm_host(), rtol=1e-9)


def test_device_conserves_matches_host():
    from dynamite_tpu.operators import sigmax, index_sum

    H = models.heisenberg(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    assert H.conserves(sub) is H._conserves_host(sub) is True

    flip = index_sum(sigmax(), size=L)
    flip.add_subspace(sub)
    assert flip.conserves(sub) is flip._conserves_host(sub) is False


def test_norm_cache_invalidation():
    H = models.ising(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    n1 = H.infinity_norm()
    H.scale(2.0)
    assert np.isclose(H.infinity_norm(), 2 * n1, rtol=1e-9)
