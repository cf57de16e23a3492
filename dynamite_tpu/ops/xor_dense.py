"""
XOR-blocked dense-matmul engine for many-mask XOR-mode operators (SYK).

Operators like SYK carry thousands of distinct Pauli masks; the reference
streams them as explicit CSR (bpetsc_template_2.c:57-205) and earlier
revisions here used a gather-table scan — both memory-bound on an index
stream, which a TPU serves at a tiny fraction of its matmul throughput.

This engine restructures the matvec into dense MXU work.  On an XOR-mode
pair (Full/Parity), a term acts in index space as

    y[j] += c * (-1)^{pc(j & s)} * x[j ^ m].

Split the index j = (h, a) into high/low halves (a = La low bits) and view
the state as an (nh, na) matrix.  Terms sharing the *high* parts (mh, sh)
of their mask and sign merge into one channel:

    Y += diag((-1)^{pc(h & sh)}) . X[h ^ mh, :] @ M_{mh,sh}^T

where M[a_out, a_in] = sum of c * (-1)^{pc(a_out & s_low)} over the
channel's terms with a_in = a_out ^ m_low.  The row permutation is a cheap
contiguous-row gather, the column action is an (na x na) matmul, and the
channel count drops rapidly with La (SYK N=32: 36k terms -> ~160 channels
at La=11).  The apply is a lax.scan over channels with uniform shapes —
one stacked (C, na, na) matrix table streamed from HBM, one (C, nh) row
index table, one (C, nh) row sign table — so the program size is O(1) in
the term count and the FLOPs land on the systolic array.

La is chosen to minimize a simple cost model (matmul passes + table
stream) under the table budget (config.ell_budget).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..utils.bitwise import parity

MIN_DIM = 1 << 12     # below this, launch overhead dominates any engine
CHANNEL_BATCH = 4     # channels per scan step (amortizes step dispatch)
# modeled device throughputs for the La cost model (order-of-magnitude is
# all that matters: the optimum is flat)
_MXU_FLOPS = 40e12 / 3   # f32 via 3-pass bf16
_HBM_BPS = 7e11


def _channels_at(groups, eff, La):
    """Distinct (mh, sh) channel keys at a given split."""
    keys = set()
    for gi, (m, pm, signs, coeffs) in enumerate(groups):
        mh = pm >> La
        for (s_eff, _sgn) in eff[gi]:
            keys.add((mh, s_eff >> La))
    return keys


def pick_split(groups, eff, nbits, budget, coeff_bytes):
    """Choose La minimizing modeled apply time under the table budget."""
    best = None
    for La in range(max(1, nbits // 2 - 2), nbits):
        na = 1 << La
        nh = 1 << (nbits - La)
        C = len(_channels_at(groups, eff, La))
        table = C * na * na * coeff_bytes
        if table > budget:
            continue
        # MXU tile floor: matmuls below the (8, 128) f32 tile waste lanes
        flops = C * max(nh, 8) * max(na, 128) * na * 4
        # ~15 us/step measured on v5e (slice of the M stack + take + dot),
        # amortized over the CHANNEL_BATCH channels each scan step carries;
        # the step overhead is what pushes the optimum toward few large
        # channels
        t = (flops / _MXU_FLOPS + (table + C * nh * na * 8) / _HBM_BPS
             + (C / CHANNEL_BATCH) * 15e-6 + C * 2e-6)
        if best is None or t < best[0]:
            best = (t, La, C, table)
    return best


def xor_dense_supported(plan):
    from .. import config
    if not getattr(config, 'use_xor_dense', True):
        return False
    if not plan.xor_mode or plan.dim_left != plan.dim_right:
        return False
    if not plan.use_scan:
        return False  # few-mask operators keep the Pallas / fused paths
    if plan.dim_right < MIN_DIM:
        return False
    return (plan.dim_right & (plan.dim_right - 1)) == 0


def build_xor_dense(plan, left, right):
    """Returns (apply_fn, info) or (None, None). apply_fn maps the
    (2, dim) stacked-real state through the channel scan."""
    from .. import config
    from . import ell
    from .pallas_apply import _effective_sign_mask

    if not xor_dense_supported(plan):
        return None, None

    nbits = plan.dim_right.bit_length() - 1
    real_dtype = config.real_dtype
    cb = np.dtype(real_dtype).itemsize

    # effective index-space sign masks (folds the Parity subspace bit)
    eff = []
    try:
        for m, pm, signs, coeffs in plan.groups:
            eff.append([_effective_sign_mask(int(s), int(m), left, right)
                        for s in signs])
    except TypeError:
        return None, None

    # real-coefficient operators (SYK after reduction) need no imaginary
    # table — halving the budget pressure moves the optimum to fewer,
    # larger channels
    any_imag = any(np.any(np.abs(np.imag(g[3])) > 0) for g in plan.groups)
    pick = pick_split(plan.groups, eff, nbits,
                      ell.ell_budget(), (2 if any_imag else 1) * cb)
    if pick is None:
        return None, None
    _t, La, C, _table = pick
    na = 1 << La
    nh = 1 << (nbits - La)
    amask = na - 1

    # ---- host build of the channel tables -------------------------------
    chan = {}
    a = np.arange(na, dtype=np.int64)
    for gi, (m, pm, signs, coeffs) in enumerate(plan.groups):
        pm = int(pm)
        mh, ml = pm >> La, pm & amask
        cols = a ^ ml
        for (s_eff, const_sign), c in zip(eff[gi], coeffs):
            sh, sa = s_eff >> La, s_eff & amask
            key = (mh, sh)
            M = chan.get(key)
            if M is None:
                M = np.zeros((na, na), dtype=np.complex128)
                chan[key] = M
            w = 1.0 - 2.0 * parity(a & sa)
            M[a, cols] += (complex(c) * const_sign) * w

    keys = sorted(chan.keys())
    C = len(keys)
    h = np.arange(nh, dtype=np.int64)
    # pad the channel list to a multiple of the per-step batch; padded
    # slots carry the identity permutation and a zero row sign, so they
    # contribute nothing
    KB = min(CHANNEL_BATCH, C)
    C_pad = -(-C // KB) * KB
    Ms = np.zeros((C_pad, na, na), dtype=real_dtype)
    has_imag = any(np.any(np.abs(chan[k].imag) > 0) for k in keys)
    Mi = np.zeros((C_pad, na, na), dtype=real_dtype) if has_imag else None
    rowidx = np.tile(h.astype(np.int32), (C_pad, 1))
    wh = np.zeros((C_pad, nh), dtype=real_dtype)
    for i, k in enumerate(keys):
        Ms[i] = chan[k].real
        if has_imag:
            Mi[i] = chan[k].imag
        rowidx[i] = (h ^ k[0]).astype(np.int32)
        wh[i] = 1.0 - 2.0 * parity(h & k[1])

    S = C_pad // KB
    Ms_d = jnp.asarray(Ms.reshape(S, KB, na, na))
    Mi_d = None if Mi is None else jnp.asarray(Mi.reshape(S, KB, na, na))
    rowidx_d = jnp.asarray(rowidx.reshape(S, KB, nh))
    wh_d = jnp.asarray(wh.reshape(S, KB, nh))
    prec = lax.Precision.HIGHEST if cb == 8 else lax.Precision.HIGH

    def apply_fn(x):
        dtype = x.dtype
        xv = x.reshape(2, nh, na)
        y0 = jnp.zeros((2, nh, na), dtype)

        def step(y, args):
            if Mi_d is None:
                M, ridx, w = args
            else:
                M, Mim, ridx, w = args
            for j in range(KB):
                src = jnp.take(xv, ridx[j], axis=1)
                Md = M[j].astype(dtype)
                if Mi_d is None:
                    out = jnp.einsum('pha,oa->pho', src, Md,
                                     precision=prec)
                else:
                    Mid = Mim[j].astype(dtype)
                    yr = jnp.einsum('ha,oa->ho', src[0], Md,
                                    precision=prec) \
                        - jnp.einsum('ha,oa->ho', src[1], Mid,
                                     precision=prec)
                    yi = jnp.einsum('ha,oa->ho', src[1], Md,
                                    precision=prec) \
                        + jnp.einsum('ha,oa->ho', src[0], Mid,
                                     precision=prec)
                    out = jnp.stack([yr, yi])
                y = y + out * w[j].astype(dtype)[None, :, None]
            return y, None

        xs = (Ms_d, rowidx_d, wh_d) if Mi_d is None \
            else (Ms_d, Mi_d, rowidx_d, wh_d)
        y, _ = lax.scan(step, y0, xs)
        return y.reshape(2, plan.dim_left)

    info = {'La': La, 'channels': C,
            'table_bytes': Ms.nbytes + (0 if Mi is None else Mi.nbytes)
            + rowidx.nbytes + wh.nbytes}
    apply_fn.xor_dense_info = info
    return apply_fn, info
