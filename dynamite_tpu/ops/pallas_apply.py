"""
Pallas TPU kernel for the XOR-fast-path Pauli matvec (Full/Parity subspace
pairs).

STATUS: experimental, not wired into the default dispatch. The row-chunked
XLA path (apply.py::_build_local_chunked) currently wins: measured at L=24
it runs at ~650 GB/s effective (near HBM speed of light) with ~2s compiles,
while this kernel's MXU-matmul in-tile permutation both compiles slowly
under Mosaic and runs slower. Kept as the foundation for a revision that
replaces the permutation matmuls with lane shuffles/rolls.

The design: tile the output; each output block accumulates every mask
group's contribution in VMEM and is written once, and each *distinct*
block-level mask costs exactly one (auto-pipelined) source-block fetch —
the TPU analog of the reference's cache-blocked fast matvec
(MatMult_CPU_Fast, bpetsc_template_2.c:598-889), with its per-destination
mask grouping.

Within a block (B = R x 128 elements):

* the XOR permutation of rows/lanes is two one-hot matmuls on the MXU
  (P_row @ tile @ P_col);
* the per-term Walsh sign (-1)^parity(k & s_eff) factorizes over
  (block, row, lane) bits, so each group's coefficient tile is
  F = (U * w_blk).T @ V — one small (R x T x 128) MXU matmul, where U/V are
  host-precomputed ±coeff row/lane sign patterns and w_blk is the per-block
  scalar sign computed in-kernel;
* y_tile += F o (permuted x_tile), complex over stacked re/im planes.

The Parity subspace folds into the same form: its sign/permutation
structure reduces to an effective sign mask over the *index* space plus a
static per-term sign (see _effective_sign_mask).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.bitwise import parity as parity_np

LANE_BITS = 7          # 128 lanes
DEFAULT_BLOCK_BITS = 13  # 8192-element blocks: (64, 128) f32 tiles


def _effective_sign_mask(s, m, left, right):
    """Reduce parity(bra & s) to parity(k & s_eff) ^ const over row indices
    k, for XOR-mode subspace pairs.

    Full: bra = k ^ m            -> s_eff = s,        const = parity(m & s)
    Parity: bra = ((k<<1)|pb) ^ m with pb = parity(k) ^ space
        -> s_eff = (s>>1) ^ (all-ones if s&1), folding the parity bit's
           contribution parity(k) into the mask; const collects the m and
           space terms.
    Returns (s_eff, sign) with sign = +-1.
    """
    from .. import subspaces as sp
    lbase = left.parent if isinstance(left, sp.XParity) else left
    if isinstance(lbase, sp.Full):
        s_eff = int(s)
        const = int(parity_np(np.int64(s & m)))
        return s_eff, 1 - 2 * const
    if isinstance(lbase, sp.Parity):
        nbits = lbase.L - 1
        ones = (1 << nbits) - 1
        s_eff = (int(s) >> 1) ^ (ones if (s & 1) else 0)
        const = int(parity_np(np.int64((s >> 1) & (m >> 1))))
        const ^= int(s & 1) & (lbase.space ^ (int(m) & 1))
        return s_eff, 1 - 2 * const
    raise TypeError('effective sign mask only defined for Full/Parity')


class PallasXorPlan:
    """Host-side constants for the kernel, built from an apply-plan's mask
    groups."""

    def __init__(self, plan, left, right, block_bits=DEFAULT_BLOCK_BITS):
        nbits = plan.dim_right.bit_length() - 1
        self.nbits = nbits
        self.block_bits = min(block_bits, nbits)
        self.dim = plan.dim_right
        B = 1 << self.block_bits
        self.B = B
        self.R = max(B // 128, 1)
        R = self.R
        self.n_blocks = self.dim // B

        row_bits = self.block_bits - LANE_BITS
        assert row_bits >= 3, 'block too small'

        # uniform term count per group (zero-padded; zero coeffs are inert)
        groups = plan.groups
        T = max(len(g[2]) for g in groups)
        self.T = T
        G = len(groups)
        self.G = G

        lane_ids = np.arange(128)
        row_ids = np.arange(R)

        prow = np.zeros((G, R, R), np.float32)
        pcol = np.zeros((G, 128, 128), np.float32)
        ucr = np.zeros((G, T, R), np.float32)
        uci = np.zeros((G, T, R), np.float32)
        vlane = np.zeros((G, T, 128), np.float32)
        sblk = np.zeros((G, T), np.int32)
        mblk = np.zeros(G, np.int32)

        order = np.argsort([g[1] >> self.block_bits for g in groups],
                           kind='stable')
        for gi, g_idx in enumerate(order):
            m_full, perm_mask, signs, coeffs = groups[g_idx]
            m_lane = perm_mask & 127
            m_row = (perm_mask >> LANE_BITS) & (R - 1)
            mblk[gi] = perm_mask >> self.block_bits

            prow[gi, row_ids, row_ids ^ m_row] = 1.0
            pcol[gi, lane_ids ^ m_lane, lane_ids] = 1.0

            for t, (s, c) in enumerate(zip(signs, coeffs)):
                s_eff, const_sign = _effective_sign_mask(
                    int(s), m_full, left, right)
                cc = complex(c) * const_sign
                w_lane = 1.0 - 2.0 * parity_np(lane_ids & (s_eff & 127))
                w_row = 1.0 - 2.0 * parity_np(
                    row_ids & ((s_eff >> LANE_BITS) & (R - 1)))
                vlane[gi, t] = w_lane
                ucr[gi, t] = cc.real * w_row
                uci[gi, t] = cc.imag * w_row
                sblk[gi, t] = s_eff >> self.block_bits

        self.prow, self.pcol = prow, pcol
        self.ucr, self.uci, self.vlane = ucr, uci, vlane
        self.sblk, self.mblk = sblk, mblk
        self.has_imag = bool(np.any(uci != 0))

        # distinct block-mask runs (groups were sorted by mblk)
        runs = []
        start = 0
        for gi in range(1, G + 1):
            if gi == G or mblk[gi] != mblk[start]:
                runs.append((int(mblk[start]), start, gi))
                start = gi
        self.runs = runs


def build_pallas_apply(plan, left, right, block_bits=DEFAULT_BLOCK_BITS,
                       interpret=False):
    """Returns a traceable fn (2, dim) -> (2, dim) running the Pallas
    kernel, or None if the plan is unsupported."""
    if not plan.xor_mode or plan.dim_left != plan.dim_right:
        return None
    if plan.dim_right < (1 << 10):
        return None
    if not plan.groups:
        return None

    p = PallasXorPlan(plan, left, right, block_bits)
    R, B, G, T = p.R, p.B, p.G, p.T

    prow_c = jnp.asarray(p.prow)
    pcol_c = jnp.asarray(p.pcol)
    ucr_c = jnp.asarray(p.ucr)
    uci_c = jnp.asarray(p.uci)
    v_c = jnp.asarray(p.vlane)
    sblk_c = jnp.asarray(p.sblk)
    has_imag = p.has_imag
    runs = p.runs
    n_blocks = p.n_blocks

    def kernel(*refs):
        # refs: one x view per distinct block mask, then the constants,
        # then y
        x_refs = refs[:len(runs)]
        prow, pcol, ucr, uci, v, sblk = refs[len(runs):len(runs) + 6]
        y_ref = refs[len(runs) + 6]

        i = pl.program_id(0)

        acc_r = jnp.zeros((R, 128), jnp.float32)
        acc_i = jnp.zeros((R, 128), jnp.float32)

        for run_idx, (m_blk, g_start, g_end) in enumerate(runs):
            tile = x_refs[run_idx][...].reshape(2, R, 128)
            xr, xi = tile[0], tile[1]

            for g in range(g_start, g_end):
                # XOR permutation: P_row @ x @ P_col on the MXU
                pr = prow[g]
                pc = pcol[g]
                xr_p = jnp.dot(jnp.dot(pr, xr),
                               pc, preferred_element_type=jnp.float32)
                xi_p = jnp.dot(jnp.dot(pr, xi),
                               pc, preferred_element_type=jnp.float32)

                # per-block scalar Walsh signs for each term
                wb = (1 - 2 * (lax.population_count(
                    sblk[g] & jnp.broadcast_to(i, (T,)).astype(jnp.int32))
                    & 1)).astype(jnp.float32)

                fr = jnp.dot((ucr[g] * wb[:, None]).T, v[g],
                             preferred_element_type=jnp.float32)
                acc_r = acc_r + fr * xr_p
                acc_i = acc_i + fr * xi_p
                if has_imag:
                    fi = jnp.dot((uci[g] * wb[:, None]).T, v[g],
                                 preferred_element_type=jnp.float32)
                    acc_r = acc_r - fi * xi_p
                    acc_i = acc_i + fi * xr_p

        y_ref[0] = acc_r.reshape(B)
        y_ref[1] = acc_i.reshape(B)

    def _block_spec(m_blk):
        # the source block for output block i is i ^ m_blk — Mosaic
        # pipelines these DMAs automatically
        return pl.BlockSpec((2, B), lambda i, mb=m_blk: (0, i ^ mb),
                            memory_space=pltpu.VMEM)

    def apply_fn(x):
        in_specs = ([_block_spec(m_blk) for m_blk, _, _ in runs]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6)
        args = tuple(x for _ in runs) + (
            prow_c, pcol_c, ucr_c, uci_c, v_c, sblk_c)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((2, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, p.dim), jnp.float32),
            interpret=interpret,
        )(*args)

    return apply_fn
