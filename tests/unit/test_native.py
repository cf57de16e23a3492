"""
Tests for the optional native host library (ctypes bindings): every entry
point must agree with its pure-numpy oracle. Skipped cleanly when no
compiler is available (the package works without the native build).
"""

import math

import numpy as np
import pytest

from dynamite_tpu import _native
from dynamite_tpu.utils.bitwise import parity

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason='native library not built')


def test_parity_and():
    rng = np.random.RandomState(0)
    states = rng.randint(0, 1 << 40, size=1000).astype(np.int64)
    for mask in (0, 1, 0b1011, (1 << 40) - 1, 0x5555555555):
        got = _native.parity_and(states, mask)
        expected = parity(states & np.int64(mask)).astype(np.uint8)
        assert np.array_equal(got, expected)


def test_spinconserve_roundtrip():
    """The native sector-major (un)ranking must agree with the pure-numpy
    layout implementation (ops/sectors.py)."""
    from dynamite_tpu.ops import sectors

    L, k = 12, 5
    lay = sectors.layout(L, k)
    dim = math.comb(L, k)
    nchoosek = sectors.nchoosek_table(L, k)
    idxs = np.arange(dim, dtype=np.int64)
    states = _native.spinconserve_i2s(idxs, L, k, nchoosek, lay.La,
                                      lay.off, lay.t, lay.kr, lay.ka,
                                      lay.na)
    assert np.array_equal(states, sectors.idx_to_state(lay, idxs))
    pops = np.array([bin(int(s)).count('1') for s in states])
    assert np.all(pops == k)
    back = _native.spinconserve_s2i(states, L, k, nchoosek, lay.La,
                                    lay.off_tk, lay.na_tk)
    assert np.array_equal(back, idxs)
    # wrong-popcount states map to -1
    bad = _native.spinconserve_s2i(np.array([0, (1 << L) - 1]), L, k,
                                   nchoosek, lay.La, lay.off_tk, lay.na_tk)
    assert np.all(bad == -1)
