"""
MINRES inner solver (solvers/minres.py) against dense numpy solves — the
building block of the shift-invert target eigensolver.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dynamite_tpu import config, models
from dynamite_tpu.subspaces import Full, SpinConserve
from dynamite_tpu.solvers.minres import minres_solver

L = 6


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


def check_minres(H, sub, shift, rtol=1e-11):
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    dim = sub.get_dimension()

    A = H.to_numpy(subspaces=(sub, sub)).toarray() - shift * np.eye(dim)

    rng = np.random.RandomState(42)
    b = rng.standard_normal((2, dim)) + 0.0
    bc = b[0] + 1j * b[1]

    solve = minres_solver(kernel.traceable(False), shift=shift,
                          maxiter=4 * dim, rtol=rtol)
    x = np.asarray(solve(jnp.asarray(b, dtype=config.real_dtype)))
    xc = x[0] + 1j * x[1]

    resid = np.linalg.norm(A @ xc - bc) / np.linalg.norm(bc)
    assert resid < 100 * rtol


def test_indefinite_interior_shift():
    """Shift inside the spectrum: the indefinite case MINRES exists for."""
    H = models.localized(L)
    dense = np.linalg.eigvalsh(H.to_numpy().toarray())
    mid = len(dense) // 2
    shift = float(0.6 * dense[mid] + 0.4 * dense[mid + 1])
    check_minres(H, Full(L=L), shift)


def test_definite_shift():
    """Shift below the spectrum: the definite (easy) case."""
    H = models.ising(L)
    dense = np.linalg.eigvalsh(H.to_numpy().toarray())
    check_minres(H, Full(L=L), float(dense[0] - 1.0))


def test_subspace_shift():
    H = models.heisenberg(L)
    sub = SpinConserve(L, L // 2)
    H.add_subspace(sub)
    dense = np.linalg.eigvalsh(H.to_numpy(subspaces=(sub, sub)).toarray())
    mid = len(dense) // 2
    shift = float(0.6 * dense[mid] + 0.4 * dense[mid + 1])
    check_minres(H, sub, shift)


def test_zero_rhs():
    H = models.ising(L)
    sub = Full(L=L)
    H.add_subspace(sub)
    kernel = H.get_mat(subspaces=(sub, sub))
    solve = minres_solver(kernel.traceable(False), shift=0.3)
    x = np.asarray(solve(jnp.zeros((2, 1 << L), dtype=config.real_dtype)))
    assert np.all(x == 0)
