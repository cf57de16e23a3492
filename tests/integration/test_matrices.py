"""
Matrix-entry integration tests: read the matrix back column-by-column by
applying the compiled kernel to basis vectors and compare every entry to the
numpy oracle (modeled on the reference's tests/integration/test_matrices.py,
which probes `mat.mult` on basis vectors, test_matrices.py:21-66).
"""

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve, Explicit, XParity
from dynamite_tpu import models

L = 5


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
]


def matrix_by_columns(H, sub):
    """Rebuild the dense matrix one column at a time through H.dot."""
    dim = sub.get_dimension()
    cols = []
    for j in range(dim):
        e = State(subspace=sub)
        e.set_all_numpy(np.eye(dim, dtype=np.complex128)[:, j])
        cols.append(H.dot(e).to_numpy())
    return np.stack(cols, axis=1)


@pytest.mark.parametrize('name,builder', MODELS, ids=[m[0] for m in MODELS])
@pytest.mark.parametrize('subname', ['full', 'even', 'odd', 'spinconserve'])
def test_entries(name, builder, subname):
    H = builder(L)
    if subname == 'full':
        sub = Full(L=L)
    elif subname in ('even', 'odd'):
        sub = Parity(subname, L=L)
    else:
        if name != 'localized':
            pytest.skip('only the U(1)-symmetric model conserves Sz')
        sub = SpinConserve(L, 2)
    H.allow_projection = True
    H.add_subspace(sub)

    expected = np.asarray(H.to_numpy().todense())
    got = matrix_by_columns(H, sub)
    scale = max(np.max(np.abs(expected)), 1e-30)
    assert np.max(np.abs(got - expected)) / scale < 1e-5


def test_entries_explicit():
    """Explicit subspace over a hand-picked state list."""
    H = models.localized(L)
    states = np.array(sorted({0b00111, 0b01011, 0b01101, 0b10110, 0b11001}),
                      dtype=np.int64)
    sub = Explicit(states, L=L)
    H.allow_projection = True
    H.add_subspace(sub)
    expected = np.asarray(H.to_numpy().todense())
    got = matrix_by_columns(H, sub)
    assert expected.shape == (len(states), len(states))
    scale = max(np.max(np.abs(expected)), 1e-30)
    assert np.max(np.abs(got - expected)) / scale < 1e-5


def test_entries_xparity():
    """XParity layered on Full: kernel entries match the reduced MSC oracle."""
    H = models.ising(L)
    for sector in ('+', '-'):
        sub = XParity(sector=sector, L=L)
        H.allow_projection = True
        H.add_subspace(sub)
        expected = np.asarray(H.to_numpy(subspaces=(sub, sub)).todense())
        got = matrix_by_columns(H, sub)
        scale = max(np.max(np.abs(expected)), 1e-30)
        assert np.max(np.abs(got - expected)) / scale < 1e-5


def test_nonsquare_projection():
    """Distinct (left, right) subspaces: project Full -> Parity and back."""
    H = models.ising(L)
    H.allow_projection = True
    full = Full(L=L)
    even = Parity('even', L=L)
    for left, right in ((even, full), (full, even)):
        H.add_subspace(left, right)
        expected = np.asarray(H.to_numpy(subspaces=(left, right)).todense())
        dim_r = right.get_dimension()
        cols = []
        for j in range(dim_r):
            e = State(subspace=right)
            e.set_all_numpy(np.eye(dim_r, dtype=np.complex128)[:, j])
            out = State(subspace=left)
            H.dot(e, result=out)
            cols.append(out.to_numpy())
        got = np.stack(cols, axis=1)
        scale = max(np.max(np.abs(expected)), 1e-30)
        assert np.max(np.abs(got - expected)) / scale < 1e-5
