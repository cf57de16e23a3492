"""
Eigensolving against dense numpy eigvalsh and residual checks (the
reference's oracles: tests/integration/test_eigsolve.py:31-88).
"""

import numpy as np
import pytest

from dynamite_tpu import config
from dynamite_tpu.subspaces import Full, Parity, SpinConserve, XParity
from dynamite_tpu import models
from dynamite_tpu.computations import eigsolve

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def check_eigs(H, sub, nev=1, which='lowest', tol=1e-9, **kwargs):
    H = H.copy()
    H.add_subspace(sub)
    evals = H.eigsolve(nev=nev, which=which, **kwargs)
    dense = np.linalg.eigvalsh(H.to_numpy().toarray())
    if which == 'lowest':
        expected = dense[:nev]
    elif which == 'highest':
        expected = np.sort(dense[-nev:])
    else:  # exterior
        expected = np.sort(dense[np.argsort(-np.abs(dense))[:nev]])
    got = np.sort(evals[:nev])
    assert np.max(np.abs(got - expected)) < tol, (got, expected)


def test_ground_state():
    check_eigs(models.ising(L), Full(L=L))


def test_multiple():
    check_eigs(models.localized(L), Full(L=L), nev=4)


def test_highest():
    check_eigs(models.localized(L), Full(L=L), nev=2, which='highest')


def test_exterior():
    check_eigs(models.localized(L), Full(L=L), nev=1, which='exterior')


def test_subspaces():
    H = models.heisenberg(L)
    for sub in (Parity('even', L=L), SpinConserve(L, L // 2),
                XParity(SpinConserve(L, L // 2))):
        check_eigs(H, sub, nev=2)


def test_eigenvector_residuals():
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    evals, evecs = H.eigsolve(nev=2, getvecs=True)
    for lam, v in zip(evals[:2], evecs[:2]):
        assert abs(v.norm() - 1) < 1e-9
        residual = H.dot(v) - lam * v
        assert residual.norm() < 1e-7


@pytest.mark.parametrize('method', ['shift_invert', 'fold'])
def test_target(method):
    H = models.localized(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    dense = np.linalg.eigvalsh(H.to_numpy().toarray())
    mid = len(dense) // 2
    # deliberately off the midpoint: the midpoint makes the two neighbors
    # exactly equidistant, so "closest" would be ambiguous
    target = float(0.7 * dense[mid] + 0.3 * dense[mid + 1])
    evals = H.eigsolve(nev=2, target=target, target_method=method)
    expected = dense[np.argsort(np.abs(dense - target))[:2]]
    assert np.max(np.abs(np.sort(evals[:2]) - np.sort(expected))) < 1e-7


def test_target_requires_value():
    H = models.ising(L)
    H.add_subspace(Full(L=L))
    with pytest.raises(ValueError):
        H.eigsolve(which='target')


def test_deprecated_which():
    H = models.ising(L)
    H.add_subspace(Full(L=L))
    with pytest.warns(DeprecationWarning):
        evals = H.eigsolve(nev=1, which='smallest')
    dense = np.linalg.eigvalsh(H.to_numpy().toarray())
    assert abs(evals[0] - dense[0]) < 1e-9


class TestDegenerate:
    """Repeated eigenvalues must come out with correct multiplicity: a
    single-vector Krylov space is blind to the second copy of a degenerate
    eigenspace, so the solver's random-injection verification cycles are
    what make these pass (the reference leans on SLEPc Krylov-Schur
    locking; its degenerate Heisenberg tests are
    tests/integration/test_eigsolve.py:31-88)."""

    def test_su2_multiplets_full(self):
        # isotropic Heisenberg, full space: the lowest excitations form
        # SU(2) multiplets (triplet at L=8)
        H = models.heisenberg(8)
        check_eigs(H, Full(L=8), nev=6, tol=1e-7)

    def test_su2_multiplets_spinconserve(self):
        H = models.heisenberg(8)
        sub = SpinConserve(8, 4)
        H = H.copy()
        H.add_subspace(sub)
        evals = H.eigsolve(nev=5)
        dense = np.linalg.eigvalsh(
            H.to_numpy(subspaces=(sub, sub)).toarray())
        assert np.max(np.abs(np.sort(evals[:5]) - dense[:5])) < 1e-7

    def test_verification_cycle_ran(self):
        from dynamite_tpu import computations
        H = models.heisenberg(8)
        H.add_subspace(Full(L=8))
        H.eigsolve(nev=4)
        assert computations.last_solve_stats.get('verify_cycles', 0) >= 1
