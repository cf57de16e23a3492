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
of their mask and sign AND the type of their coefficient (purely real or
purely imaginary — every Pauli-string term is one or the other) merge into
one channel:

    Y += diag((-1)^{pc(h & sh)}) . X[h ^ mh, :] @ B_{mh,sh,type}^T

where B[a_out, a_in] = sum of |c| * sign * (-1)^{pc(a_out & s_low)} over
the channel's terms with a_in = a_out ^ m_low.  Keying on the coefficient
type keeps every channel SINGLE-table: a real-type channel multiplies both
planes by B; an imaginary-type channel multiplies and rotates the planes
(yr -= B xi, yi += B xr).  Compared to carrying (real, imag) table pairs on
every channel this halves both the HBM table stream and the MXU work of
pure channels — on SYK N=32 at La=9, 2.29 GB -> 1.54 GB and 378 of 1093
(mh, sh) channels were mixed-type pairs.

The row permutation is a cheap contiguous-row gather; the column action is
one (2*nh, na) @ (na, na) matmul per channel — the re/im planes are folded
into the ROW axis so the MXU sees full 128-row tiles even when nh < 128.
The apply is a lax.scan per type class with uniform shapes — one stacked
(C, na, na) matrix table streamed from HBM, one (C, nh) row index table,
one (C, nh) row sign table — so program size is O(1) in the term count and
the FLOPs land on the systolic array.

La is chosen to minimize a simple cost model (matmul passes + table
stream + per-step dispatch) under the table budget (config.ell_budget).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..utils.bitwise import parity

MIN_DIM = 1 << 12     # below this, launch overhead dominates any engine
CHANNEL_BATCH = 64    # channels per scan step (amortizes step dispatch)
# La cost-model constants calibrated on TPU v5e (SYK N=32 sweep, round 5):
# per-step cost ~25 us; effective f32 matmul rate scales with the channel
# width na (small matmuls underfill the MXU pipeline)
_MXU_FLOPS = 60e12
_HBM_BPS = 8e11
_STEP_S = 25e-6
_COEFF_TOL = 0.0         # exact: a term is real xor imaginary


def _typed_channels_at(groups, eff, La):
    """Distinct (mh, sh, type) channel keys at a given split."""
    keys = set()
    for gi, (m, pm, signs, coeffs) in enumerate(groups):
        mh = pm >> La
        for (s_eff, _sgn), c in zip(eff[gi], coeffs):
            if abs(c.real) > _COEFF_TOL:
                keys.add((mh, s_eff >> La, 0))
            if abs(c.imag) > _COEFF_TOL:
                keys.add((mh, s_eff >> La, 1))
    return keys


def pick_split(groups, eff, nbits, budget, coeff_bytes):
    """Choose La minimizing modeled apply time under the table budget."""
    best = None
    for La in range(max(1, nbits // 2 - 3), nbits):
        na = 1 << La
        nh = 1 << (nbits - La)
        C = len(_typed_channels_at(groups, eff, La))
        table = C * na * na * coeff_bytes
        if table > budget:
            continue
        # planes fold into rows: (2*nh, na) @ (na, na), padded to the
        # (128, 128) f32 MXU tile; narrow channels underfill the MXU
        flops = C * max(2 * nh, 128) * max(na, 128) * na * 2
        mxu_eff = na / (na + 384)
        t = (flops / (_MXU_FLOPS * mxu_eff)
             + (table + C * nh * na * 8) / _HBM_BPS
             + (C / CHANNEL_BATCH) * _STEP_S)
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


def _class_scan(Ms, rowidx, wh, na, nh, prec, imag_type, batch):
    """Build the scan over one type class. Tables: (C_pad, na, na),
    (C_pad, nh), (C_pad, nh) reshaped into (S, KB, ...) step batches.

    Each step is ONE batched gather + ONE batched dot_general over its KB
    channels (an unrolled per-channel inner loop cost ~4x the ops per step
    and measurably more dispatch time on hardware)."""
    C_pad = Ms.shape[0]
    S = C_pad // batch
    Ms_d = jnp.asarray(Ms.reshape(S, batch, na, na))
    rowidx_d = jnp.asarray(rowidx.reshape(S, batch, nh))
    wh_d = jnp.asarray(wh.reshape(S, batch, nh))

    def run(xv, y, dtype):
        # xv: (2, nh, na)
        def step(y, args):
            M, ridx, w = args
            src = jnp.take(xv, ridx.reshape(-1), axis=1) \
                .reshape(2, batch, nh, na)
            # batch over channels; the (plane, row) free dims fold into
            # full MXU row tiles even when nh < 128
            out = lax.dot_general(
                src, M.astype(dtype),
                (((3,), (2,)), ((1,), (0,))),
                precision=prec)                     # (batch, 2, nh, na)
            out = out * w.astype(dtype)[:, None, :, None]
            contrib = jnp.sum(out, axis=0)          # (2, nh, na)
            if imag_type:
                # table holds the term coefficients' imaginary parts:
                # y += i * (B x)
                y = y + jnp.stack([-contrib[1], contrib[0]])
            else:
                y = y + contrib
            return y, None

        y, _ = lax.scan(step, y, (Ms_d, rowidx_d, wh_d))
        return y

    return run


def build_xor_dense(plan, left, right):
    """Returns (apply_fn, info) or (None, None). apply_fn maps the
    (2, dim) stacked-real state through the typed channel scans."""
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

    pick = pick_split(plan.groups, eff, nbits, ell.ell_budget(), cb)
    if pick is None:
        return None, None
    _t, La, C, _table = pick
    # manual override for tuning experiments (config.xor_dense_la)
    La_cfg = getattr(config, 'xor_dense_la', None)
    if La_cfg is not None:
        La = int(La_cfg)
    na = 1 << La
    nh = 1 << (nbits - La)
    amask = na - 1

    # ---- host build of the typed channel tables -------------------------
    chan = {}
    a = np.arange(na, dtype=np.int64)
    for gi, (m, pm, signs, coeffs) in enumerate(plan.groups):
        pm = int(pm)
        mh, ml = pm >> La, pm & amask
        cols = a ^ ml
        for (s_eff, const_sign), c in zip(eff[gi], coeffs):
            sh, sa = s_eff >> La, s_eff & amask
            w = 1.0 - 2.0 * parity(a & sa)
            for typ, part in ((0, (complex(c) * const_sign).real),
                              (1, (complex(c) * const_sign).imag)):
                if abs(part) <= _COEFF_TOL:
                    continue
                key = (mh, sh, typ)
                B = chan.get(key)
                if B is None:
                    B = np.zeros((na, na), dtype=np.float64)
                    chan[key] = B
                B[a, cols] += part * w

    h = np.arange(nh, dtype=np.int64)
    runs = []
    table_bytes = 0
    for typ in (0, 1):
        keys = sorted(k for k in chan if k[2] == typ)
        if not keys:
            continue
        Ct = len(keys)
        KB = min(CHANNEL_BATCH, Ct)
        C_pad = -(-Ct // KB) * KB
        Ms = np.zeros((C_pad, na, na), dtype=real_dtype)
        rowidx = np.tile(h.astype(np.int32), (C_pad, 1))
        wh = np.zeros((C_pad, nh), dtype=real_dtype)
        for i, k in enumerate(keys):
            Ms[i] = chan[k]
            rowidx[i] = (h ^ k[0]).astype(np.int32)
            wh[i] = 1.0 - 2.0 * parity(h & k[1])
        table_bytes += Ms.nbytes + rowidx.nbytes + wh.nbytes
        prec = lax.Precision.HIGHEST if cb == 8 else lax.Precision.HIGH
        runs.append(_class_scan(Ms, rowidx, wh, na, nh, prec,
                                imag_type=bool(typ), batch=KB))

    def apply_fn(x):
        dtype = x.dtype
        xv = x.reshape(2, nh, na)
        y = jnp.zeros((2, nh, na), dtype)
        for run in runs:
            y = run(xv, y, dtype)
        return y.reshape(2, plan.dim_left)

    info = {'La': La, 'channels': len(chan), 'table_bytes': table_bytes}
    apply_fn.xor_dense_info = info
    return apply_fn, info
