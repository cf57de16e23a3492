"""
Memory-scaling distributed sector engine for SpinConserve pairs.

The round-4 distributed SpinConserve path expressed the global sector-matmul
program once and let GSPMD partition it; that is correct but the partitioner
materializes ~4.4x one full input in per-device temps — *worse* than the
reference's known-weak multi-GPU allgather
(bcuda_template_2.cu:164-171). The reference's CPU multi-rank path streams
with O(dim/ranks) resident memory (bpetsc_template_2.c:413-504); this module
beats both with an explicit shard_map program whose per-device peak is
O(dim/n_devices + one exchange window).

Key observation — pick the sharded axis so communication vanishes from two
of the three channel families. In the sector-major basis
(ops/sectors.py) each sector is a contiguous (nb x na) matrix: rows indexed
by the rank of the high-rest bits (beta), columns by the rank of the low
half (alpha). The engine's channels (ops/sector_apply.SectorPlan) act as

  * row channels:   Y_so += ca ⊙ (N @ X_si)        — mixes beta, alpha untouched
  * col channels:   Y_so += W ⊙ (X_si[bidx] @ M^T) — permutes beta, mixes alpha
  * diagonal:       Y    += D ⊙ X                   — elementwise

Sharding **alpha** (each device owns an na/nd column slice of every sector)
makes row channels and the beta gather `X_si[bidx]` purely local; only the
col-channel alpha matmuls touch remote data. Those run as a *ring*: the
local column block circulates via lax.ppermute and each device accumulates
  Y[:, my cols] += X_ring[bidx] @ M[my out-cols, ring in-cols]^T
so the resident window is one (2, dim/nd) block. The M tables themselves
are sharded over their output-alpha rows (NamedSharding P('d', None)) —
table memory scales with devices too. Total exchange volume is one state
per apply, the same as the reference's allgather, at 1/nd its memory.

The public state layout stays the canonical sector-major flat vector,
contiguously sharded (parallel.mesh). Conversion to/from the internal
alpha-sharded layout is two more table-free ring passes: the receiver
computes, from pure index arithmetic on (sector, beta, alpha) coordinates,
which elements of the passing canonical block are its own — no
scatter/gather index tables at state scale, no sender-side bookkeeping.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P


def _cdiv(a, b):
    return -(-a // b)


class AlphaLayout:
    """Static description of the alpha-sharded engine layout.

    For each participating sector i (order = SectorPlan.secs):
      nb[i], na[i] : canonical block shape
      w[i]         : per-device column-slice width (na padded to nd * w)
      aoff[i]      : offset of the sector's (nb, w) block in the local
                     engine buffer
      off[i]       : canonical flat offset of the sector
    """

    def __init__(self, sector_plan, nd):
        lay = sector_plan.lay
        secs = sector_plan.secs
        base = int(lay.off[secs[0]])
        self.nd = nd
        self.nb = [int(lay.nb[s]) for s in secs]
        self.na = [int(lay.na[s]) for s in secs]
        self.off = [int(lay.off[s]) - base for s in secs]
        self.w = [_cdiv(n, nd) for n in self.na]
        self.aoff = []
        o = 0
        for nb, w in zip(self.nb, self.w):
            self.aoff.append(o)
            o += nb * w
        self.local_dim = o
        self.dim = sector_plan.dim

    def meta_arrays(self, int_dtype):
        """Small per-sector tables used by the traced index arithmetic."""
        return tuple(jnp.asarray(np.asarray(a, dtype=int_dtype))
                     for a in (self.aoff, self.w, self.na, self.off,
                               self.nb))

    def engine_sources(self, device):
        """Host numpy: canonical flat index feeding each local engine
        position on ``device`` (-1 for alpha padding). Used to relayout the
        diagonal tables."""
        out = np.full(self.local_dim, -1, dtype=np.int64)
        for i in range(len(self.nb)):
            nb, na, w = self.nb[i], self.na[i], self.w[i]
            a = device * w + np.arange(w)
            valid = a < na
            block = (self.off[i] + np.arange(nb)[:, None] * na
                     + np.minimum(a, na - 1)[None, :])
            block = np.where(valid[None, :], block, -1)
            out[self.aoff[i]:self.aoff[i] + nb * w] = block.reshape(-1)
        return out


def _local_coords(alayout, meta, me, int_dtype):
    """Traced: for each local engine position, its (sector, canonical flat
    index, validity) under device ``me``."""
    aoff, w, na, off, _nb = meta
    q = lax.broadcasted_iota(int_dtype, (alayout.local_dim,), 0)
    s = jnp.searchsorted(aoff, q, side='right') - 1
    ws = w[s]
    rem = q - aoff[s]
    beta = rem // ws
    al = rem - beta * ws
    alpha = me * ws + al
    valid = alpha < na[s]
    g = off[s] + beta * na[s] + alpha
    return jnp.where(valid, g, -1)


def _canonical_coords(alayout, meta, me, local_can, dim, int_dtype):
    """Traced: for each local canonical position on ``me``, the engine
    (owner device, local engine position, validity)."""
    aoff, w, na, off, _nb = meta
    q = lax.broadcasted_iota(int_dtype, (local_can,), 0)
    g = me * jnp.asarray(local_can, int_dtype) + q
    valid = g < dim
    gc = jnp.where(valid, g, 0)
    off_arr = off
    s = jnp.searchsorted(off_arr, gc, side='right') - 1
    rem = gc - off_arr[s]
    nas = na[s]
    beta = rem // nas
    alpha = rem - beta * nas
    ws = w[s]
    d = alpha // ws
    al = alpha - d * ws
    p = aoff[s] + beta * ws + al
    return d, p, valid


def _pvary(x, axis):
    """Mark a device-invariant array as device-varying over ``axis`` (ring
    carries start as invariant zeros but become varying on the first
    update, which newer jax's shard_map type checker rejects without the
    annotation)."""
    if hasattr(lax, 'pcast'):
        return lax.pcast(x, (axis,), to='varying')
    if hasattr(lax, 'pvary'):  # pragma: no cover - older spelling
        return lax.pvary(x, (axis,))
    return x  # pragma: no cover


def _ring(x, axis, nd, body, init):
    """Circulate ``x`` around the mesh ring; ``body(r, block, acc)`` sees
    the block originating from device (me - r) mod nd at step r."""
    perm = [(i, (i + 1) % nd) for i in range(nd)]

    def step(r, carry):
        block, acc = carry
        acc = body(r, block, acc)
        block = lax.ppermute(block, axis, perm)
        return block, acc

    _final_block, acc = lax.fori_loop(0, nd, step, (x, init))
    return acc


def build_sector_sharded(plan, left, right, mesh):
    """Returns the canonical-layout sharded apply (2, sdim) -> (2, sdim)
    and its SectorPlan, or (None, None) when the sector engine does not
    support this triple. ``sdim`` is parallel.mesh.storage_dim(dim)."""
    from .. import config
    from . import ell
    from .sector_apply import (SectorPlan, sector_supported,
                               table_bytes_estimate, _precision)
    from ..parallel.mesh import storage_dim, AXIS

    if not sector_supported(plan, left, right):
        return None, None
    if not getattr(config, 'use_sector', True):
        return None, None
    if table_bytes_estimate(plan, left, right) > ell.ell_budget():
        return None, None

    sp = SectorPlan(plan, left, right, config.real_dtype)
    nd = mesh.devices.size
    alay = AlphaLayout(sp, nd)
    dim = sp.dim
    sdim = storage_dim(dim, mesh)
    local_can = sdim // nd
    int_dtype = plan.int_dtype
    prec = _precision()
    axis = AXIS
    S = len(alay.nb)

    meta = alay.meta_arrays(int_dtype)

    # ---- device tables --------------------------------------------------
    row_spec = NamedSharding(mesh, P(AXIS, None))
    vec_spec = NamedSharding(mesh, P(AXIS))
    put_cache = {}
    # the cache keys on id(); keep every keyed host array alive for the
    # build's duration so a freed temporary cannot recycle an id and
    # cross-wire two channels' tables
    keep_alive = []

    def put_m(mat, nap_o, nap_i):
        """Pad an (na_o, na_i) matrix to (nap_o, nap_i) and shard its
        output rows over the mesh."""
        keep_alive.append(mat)
        key = (id(mat), nap_o, nap_i)
        got = put_cache.get(key)
        if got is None:
            pad = np.zeros((nap_o, nap_i), dtype=mat.dtype)
            pad[:mat.shape[0], :mat.shape[1]] = mat
            got = jax.device_put(pad, row_spec)
            put_cache[key] = got
        return got

    def put_rep(arr):
        if arr is None:
            return None
        keep_alive.append(arr)
        key = id(arr)
        got = put_cache.get(key)
        if got is None:
            got = jax.device_put(np.ascontiguousarray(arr),
                                 NamedSharding(mesh, P()))
            put_cache[key] = got
        return got

    sec_index = {}
    for i, s in enumerate(sp.secs):
        sec_index[s] = i

    col_tabs = []
    for si, so, bidx, W, Mr, Mi in sp.col_channels:
        i, o = sp.sec_index[si], sp.sec_index[so]
        nap_o = alay.w[o] * nd
        nap_i = alay.w[i] * nd
        col_tabs.append((
            put_rep(None if bidx is None else bidx.astype(np.int32)),
            put_rep(W),
            put_m(Mr, nap_o, nap_i),
            None if Mi is None else put_m(Mi, nap_o, nap_i)))
    col_meta = [(sp.sec_index[si], sp.sec_index[so])
                for si, so, *_rest in sp.col_channels]

    row_tabs = []
    for si, so, ca, Nr, Ni in sp.row_channels:
        o = sp.sec_index[so]
        ca_d = None
        if ca is not None:
            pad = np.zeros(alay.w[o] * nd, dtype=ca.dtype)
            pad[:len(ca)] = ca
            ca_d = jax.device_put(pad, vec_spec)
        row_tabs.append((ca_d, put_rep(Nr), put_rep(Ni)))
    row_meta = [(sp.sec_index[si], sp.sec_index[so])
                for si, so, *_rest in sp.row_channels]

    diag_tabs = None
    if sp.diag is not None:
        eng_src = np.concatenate([alay.engine_sources(d) for d in range(nd)])
        ok = eng_src >= 0
        src = np.where(ok, eng_src, 0)

        def relay(dv):
            if dv is None:
                return None
            return jax.device_put(
                np.where(ok, dv[src], 0).astype(dv.dtype), vec_spec)

        diag_tabs = tuple(relay(dv) for dv in sp.diag)

    # ---- spec tree ------------------------------------------------------
    def like(tree, leaf_spec):
        return jax.tree_util.tree_map(lambda _x: leaf_spec, tree)

    col_specs = [(like(b, P()), like(w, P()), P(AXIS, None),
                  None if mi is None else P(AXIS, None))
                 for b, w, _mr, mi in col_tabs]
    row_specs = [(None if ca is None else P(AXIS), P(),
                  None if ni is None else P())
                 for ca, _nr, ni in row_tabs]
    diag_specs = None if diag_tabs is None else tuple(
        None if d is None else P(AXIS) for d in diag_tabs)

    # ---- the local program ---------------------------------------------
    def cplx_col(src, Mr, Mi):
        """(2, nb, w_i) x (w_o, w_i) -> (2, nb, w_o)."""
        yr = jnp.einsum('bi,oi->bo', src[0], Mr, precision=prec)
        yi = jnp.einsum('bi,oi->bo', src[1], Mr, precision=prec)
        if Mi is not None:
            yr = yr - jnp.einsum('bi,oi->bo', src[1], Mi, precision=prec)
            yi = yi + jnp.einsum('bi,oi->bo', src[0], Mi, precision=prec)
        return jnp.stack([yr, yi])

    def cplx_row(Nr, Ni, src):
        yr = jnp.einsum('ob,ba->oa', Nr, src[0], precision=prec)
        yi = jnp.einsum('ob,ba->oa', Nr, src[1], precision=prec)
        if Ni is not None:
            yr = yr - jnp.einsum('ob,ba->oa', Ni, src[1], precision=prec)
            yi = yi + jnp.einsum('ob,ba->oa', Ni, src[0], precision=prec)
        return jnp.stack([yr, yi])

    def slices(xe):
        return [lax.slice(xe, (0, alay.aoff[i]),
                          (2, alay.aoff[i] + alay.nb[i] * alay.w[i]))
                .reshape(2, alay.nb[i], alay.w[i]) for i in range(S)]

    def local_fn(x_local, cols, rows, diag):
        dtype = x_local.dtype
        me = lax.axis_index(axis).astype(int_dtype)
        nd_c = jnp.asarray(nd, int_dtype)

        # ring 1: canonical -> alpha-sharded engine layout
        g = _local_coords(alay, meta, me, int_dtype)

        def conv_in(r, block, acc):
            dsrc = (me - r.astype(int_dtype)) % nd_c
            lo = dsrc * jnp.asarray(local_can, int_dtype)
            sel = (g >= 0) & (g >= lo) & (g < lo + local_can)
            idx = jnp.clip(g - lo, 0, local_can - 1)
            return jnp.where(sel[None, :], block[:, idx], acc)

        xe = _ring(x_local, axis, nd, conv_in,
                   _pvary(jnp.zeros((2, alay.local_dim), dtype), axis))

        xs = slices(xe)

        # row channels: purely local in the alpha-sharded layout
        Ys = [_pvary(jnp.zeros((2, alay.nb[i], alay.w[i]), dtype), axis)
              for i in range(S)]
        for (i, o), (ca, Nr, Ni) in zip(row_meta, rows):
            out = cplx_row(Nr.astype(dtype),
                           None if Ni is None else Ni.astype(dtype), xs[i])
            if ca is not None:
                out = out * ca[None, None, :].astype(dtype)
            Ys[o] = Ys[o] + out

        # ring 2: col channels accumulate against the circulating block
        def col_body(r, block, acc):
            c = (me - r.astype(int_dtype)) % nd_c
            bs = slices(block)
            acc = list(acc)
            for (i, o), (bidx, W, Mr, Mi) in zip(col_meta, cols):
                src = bs[i]
                if bidx is not None:
                    src = jnp.take(src, bidx, axis=1)
                w_i = alay.w[i]
                start = (c * w_i).astype(jnp.int32)
                Mr_c = lax.dynamic_slice(
                    Mr, (jnp.zeros((), jnp.int32), start),
                    (alay.w[o], w_i)).astype(dtype)
                Mi_c = None
                if Mi is not None:
                    Mi_c = lax.dynamic_slice(
                        Mi, (jnp.zeros((), jnp.int32), start),
                        (alay.w[o], w_i)).astype(dtype)
                out = cplx_col(src, Mr_c, Mi_c)
                if W is not None:
                    out = out * W[None, :, None].astype(dtype)
                acc[o] = acc[o] + out
            return tuple(acc)

        if col_meta:
            Ys = _ring(xe, axis, nd, col_body, tuple(Ys))

        ye = jnp.concatenate([y.reshape(2, -1) for y in Ys], axis=1) \
            if S > 1 else Ys[0].reshape(2, -1)

        if diag is not None:
            Dr = diag[0].astype(dtype)
            yr = ye[0] + Dr * xe[0]
            yi = ye[1] + Dr * xe[1]
            if len(diag) > 1 and diag[1] is not None:
                Di = diag[1].astype(dtype)
                yr = yr - Di * xe[1]
                yi = yi + Di * xe[0]
            ye = jnp.stack([yr, yi])

        # ring 3: engine layout -> canonical
        d_of, p_of, valid = _canonical_coords(alay, meta, me, local_can,
                                              dim, int_dtype)

        def conv_out(r, block, acc):
            dsrc = (me - r.astype(int_dtype)) % nd_c
            sel = valid & (d_of == dsrc)
            return jnp.where(sel[None, :], block[:, p_of], acc)

        return _ring(ye, axis, nd, conv_out,
                     _pvary(jnp.zeros((2, local_can), dtype), axis))

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, AXIS), col_specs, row_specs, diag_specs),
        out_specs=P(None, AXIS))

    def apply_fn(x):
        return mapped(x, col_tabs, row_tabs, diag_tabs)

    apply_fn.sector_plan = sp
    apply_fn.alpha_layout = alay
    return apply_fn, sp
