import numpy as np

from dynamite_tpu.utils.bitwise import popcount, parity, intlog2


def test_popcount():
    x = np.array([0, 1, 2, 3, 0b1011, (1 << 60) | 7], dtype=np.int64)
    assert list(popcount(x)) == [0, 1, 1, 2, 3, 4]


def test_popcount_scalar():
    assert popcount(7) == 3


def test_parity():
    x = np.array([0, 1, 2, 3, 0b1011, (1 << 60) | 7], dtype=np.int64)
    assert list(parity(x)) == [0, 1, 1, 0, 1, 0]


def test_intlog2():
    x = np.array([1, 2, 3, 4, 1 << 40], dtype=np.int64)
    assert list(intlog2(x)) == [0, 1, 1, 2, 40]
    assert intlog2(0) == -1
