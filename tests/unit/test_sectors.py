"""
Unit tests for the sector-major SpinConserve layout (ops/sectors.py) and
the sector-engine build (ops/sector_apply.SectorPlan): the layout
invariants everything else rests on, and the channel bookkeeping.
"""

from math import comb

import numpy as np
import pytest

from dynamite_tpu.ops import sectors
from dynamite_tpu.utils.bitwise import popcount


@pytest.mark.parametrize('L,k', [(1, 0), (1, 1), (2, 1), (4, 2), (5, 2),
                                 (7, 4), (10, 3), (12, 6)])
def test_layout_roundtrip(L, k):
    lay = sectors.layout(L, k)
    dim = lay.dim
    assert dim == comb(L, k)
    idx = np.arange(dim)
    st = sectors.idx_to_state(lay, idx)
    assert np.all(popcount(st) == k)
    assert len(np.unique(st)) == dim
    assert np.array_equal(sectors.state_to_idx(lay, st), idx)


@pytest.mark.parametrize('L', [4, 6, 8])
def test_layout_half_filling_invariants(L):
    """k = L/2: top-bit-0 states occupy exactly the first half (the
    XParity representative convention) and complementation is index
    reversal."""
    k = L // 2
    lay = sectors.layout(L, k)
    dim = lay.dim
    st = sectors.idx_to_state(lay, np.arange(dim))
    assert np.all(st[:dim // 2] >> (L - 1) == 0)
    flip = (1 << L) - 1
    assert np.array_equal(sectors.state_to_idx(lay, flip ^ st),
                          np.arange(dim)[::-1])


def test_layout_sectors_contiguous():
    lay = sectors.layout(9, 4)
    # offsets strictly increasing, sizes consistent, total == dim
    sizes = lay.nb * lay.na
    assert np.array_equal(lay.off, np.concatenate([[0],
                                                   np.cumsum(sizes)[:-1]]))
    assert sizes.sum() == lay.dim
    # within each sector all states share (t, kr)
    st = sectors.idx_to_state(lay, np.arange(lay.dim))
    t, hr, sa = lay.split_state(st)
    for s in range(lay.n_sectors):
        sl = slice(int(lay.off[s]), int(lay.off[s] + sizes[s]))
        assert np.all(t[sl] == lay.t[s])
        assert np.all(popcount(hr[sl]) == lay.kr[s])
        assert np.all(popcount(sa[sl]) == lay.ka[s])


def _plan_for(H, sub):
    from dynamite_tpu.ops.apply import _Plan
    H.reduce_msc()
    msc = H.msc if sub.product_state_basis else sub.reduce_msc(H.msc)
    return _Plan(msc, sub, sub)


def test_sector_plan_channel_merge():
    """The XX and YY halves of every boundary hop share their row gather
    and (up to sign) their row scale, so they must merge into one channel
    per (input sector, output sector)."""
    from dynamite_tpu import config
    from dynamite_tpu.models import heisenberg
    from dynamite_tpu.subspaces import SpinConserve
    from dynamite_tpu.ops.sector_apply import SectorPlan

    L, k = 10, 5
    H = heisenberg(L)
    sub = SpinConserve(L, k)
    sp = SectorPlan(_plan_for(H, sub), sub, sub, np.float32)
    assert sp.conserved is True
    # cross channels (those with a row gather) come one per realizable
    # (si, so) pair — not one per sign subgroup
    cross = [(c[0], c[1]) for c in sp.col_channels if c[2] is not None]
    assert len(cross) == len(set(cross))


def test_sector_plan_conservation_flags():
    from dynamite_tpu.models import heisenberg, ising
    from dynamite_tpu.subspaces import SpinConserve
    from dynamite_tpu.ops.sector_apply import SectorPlan

    sub = SpinConserve(8, 4)
    sp = SectorPlan(_plan_for(heisenberg(8), sub), sub, sub, np.float32)
    assert sp.conserved is True
    # transverse-field Ising does not conserve magnetization
    sp2 = SectorPlan(_plan_for(ising(8), sub), sub, sub, np.float32)
    assert sp2.conserved is False


def test_table_bytes_nonzero():
    from dynamite_tpu.models import heisenberg
    from dynamite_tpu.subspaces import SpinConserve
    from dynamite_tpu.ops.sector_apply import SectorPlan

    sub = SpinConserve(10, 5)
    sp = SectorPlan(_plan_for(heisenberg(10), sub), sub, sub, np.float32)
    assert sp.table_bytes > 0
    assert sp.n_channels > 0
