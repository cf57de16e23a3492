"""
The experimental Pallas kernel against the jnp engine (interpret mode, so
it runs on the CPU test mesh).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dynamite_tpu import config
from dynamite_tpu import models
from dynamite_tpu.subspaces import Full, Parity
from dynamite_tpu.ops.pallas_apply import build_pallas_apply


@pytest.fixture(autouse=True)
def reset_config():
    config._L = None
    config._subspace = None
    yield
    config._L = None
    config._subspace = None


@pytest.mark.parametrize('case', ['full', 'parity'])
def test_pallas_vs_engine(case):
    L = 13
    if case == 'full':
        H, sub = models.localized(L), Full(L=L)
    else:
        H, sub = models.ising(L), Parity('even', L=L)
    H.allow_projection = True
    H.add_subspace(sub)
    kernel = H.get_mat()
    fn = build_pallas_apply(kernel.plan, sub, sub, interpret=True)
    assert fn is not None

    dim = sub.get_dimension()
    rng = np.random.RandomState(0)
    x = rng.standard_normal((2, dim)).astype(np.float32)
    x /= np.linalg.norm(x)
    xd = jnp.asarray(x)

    got = np.asarray(fn(xd))
    want = np.asarray(kernel.apply(xd))
    scale = max(np.max(np.abs(want)), 1e-30)
    assert np.max(np.abs(got - want)) / scale < 1e-5
