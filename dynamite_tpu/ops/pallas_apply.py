"""
Pallas TPU kernel for the XOR-fast-path Pauli matvec (Full/Parity subspace
pairs, float32 pairs).

This is the production hot kernel: the XLA engine (apply.py) materializes
roughly one HBM round-trip per mask group, while this kernel reads each
*distinct block-level source offset* once per output block, accumulates every
mask group's contribution in VMEM/registers, and writes the output once — the
TPU analog of the reference's cache-blocked fast matvec
(MatMult_CPU_Fast, bpetsc_template_2.c:598-889) with its per-destination
mask grouping and 64x64 sign lookup tables.

Decomposition of one term  y[k] += c * (-1)^parity(k' & s_eff) * x[k ^ m]
over the blocked index k = (block, row, lane) with B = R*128 elements:

* mask block bits  (m >> block_bits): handled by the BlockSpec index map —
  output block i reads source block i ^ m_blk, one auto-pipelined DMA per
  distinct m_blk ("run"), shared by every group in the run;
* mask row bits: XOR permutation along sublanes — per set bit, two
  pltpu.rolls + a select (a roll by a multiple of 8 sublanes is a vreg
  renumbering, smaller shifts are sublane shuffles);
* mask lane bits: the same roll+select construction along lanes;
* sign block bits: a per-term *scalar* (-1)^parity(i & s_blk), computed on
  the scalar core once per block;
* sign row/lane bits: the Walsh sign factorizes over the (row, lane) grid
  into an outer product w_row (x) w_lane of host-precomputed +-1 vectors, so
  each group's coefficient tile costs T broadcasted FMAs, not T*B parity
  evaluations;
* groups with mask == 0 (the diagonal) are folded into a precomputed
  diagonal vector streamed alongside x (the reference's PrecomputeDiagonal,
  bpetsc_template_1.c:169-202) when they have enough terms to be worth it.

Parity subspaces fold into the same form: their sign/permutation structure
reduces to an effective sign mask over the *index* space plus a static
per-term sign (see _effective_sign_mask).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.bitwise import parity as parity_np

LANE_BITS = 7
# largest block: 2**16 elements = (512, 128) f32 tiles per plane
MAX_BLOCK_BITS = 16
MIN_BLOCK_BITS = 10           # (8, 128) f32 minimum tile
VMEM_BUDGET = 12 * (1 << 20)  # of the ~16 MB/core
# fold mask-0 groups into a precomputed diagonal stream above this many terms
DIAG_PRECOMPUTE_MIN_TERMS = 4


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


def _bits(m):
    out = []
    j = 0
    while m:
        if m & 1:
            out.append(j)
        m >>= 1
        j += 1
    return out


class _KTerm:
    """One Pauli term, decomposed for the kernel."""
    __slots__ = ('cr', 'ci', 's_blk', 'row_col', 'lane_row')

    def __init__(self, cr, ci, s_blk, row_col, lane_row):
        self.cr = cr            # static real coefficient (incl. const sign)
        self.ci = ci
        self.s_blk = s_blk      # sign mask over block bits (static int)
        self.row_col = row_col  # column in WrowT, or None (no row factor)
        self.lane_row = lane_row  # row in Wlane, or None (no lane factor)


class PallasXorPlan:
    """Host-side decomposition of an apply-plan into kernel structure."""

    def __init__(self, plan, left, right, block_bits=None):
        nbits = plan.dim_right.bit_length() - 1
        self.dim = plan.dim_right
        self.nbits = nbits

        # the passed block_bits is an upper bound; the VMEM budget can lower
        # it (many-run operators like long_range exceed the ~16 MB/core at
        # the largest block)
        if block_bits is None:
            block_bits = MAX_BLOCK_BITS
        block_bits = min(block_bits, nbits)
        while (block_bits > MIN_BLOCK_BITS
               and self._vmem_estimate(plan, block_bits) > VMEM_BUDGET):
            block_bits -= 1
        self.block_bits = min(block_bits, nbits)
        B = 1 << self.block_bits
        self.B = B
        self.R = B >> LANE_BITS
        self.n_blocks = self.dim // B

        self._decompose(plan, left, right)

    @staticmethod
    def _runs_at(plan, block_bits):
        mblks = {g[1] >> block_bits for g in plan.groups}
        mblks.add(0)
        return len(mblks)

    @classmethod
    def _vmem_estimate(cls, plan, block_bits):
        B = 1 << block_bits
        block_bytes = 2 * B * 4          # (2, R, 128) f32
        n_runs = cls._runs_at(plan, block_bits)
        # the packed +-1 sign-factor tables are VMEM-resident in full: one
        # (R, ~nterms) column table and one (~nterms, 128) row table
        R = max(B >> LANE_BITS, 1)
        nterms = plan.nterms
        sign_tables = (R * (-(-max(nterms, 1) // 128) * 128)
                       + (-(-max(nterms, 1) // 8) * 8) * 128) * 4
        # double-buffered inputs + output + diagonal stream + constants
        return (2 * n_runs + 2 + 2) * block_bytes + sign_tables + (1 << 20)

    def _decompose(self, plan, left, right):
        B, R = self.B, self.R
        bb = self.block_bits

        diag_terms = []          # (cr, ci, s_eff)
        groups = []              # (m_blk, m_row, m_lane, [_KTerm])
        wrow_cols = []           # columns of WrowT
        wlane_rows = []          # rows of Wlane
        row_ids = np.arange(R)
        lane_ids = np.arange(128)

        # count diagonal terms first to decide on precomputation
        n_diag = sum(len(g[2]) for g in plan.groups if g[1] == 0)
        self.use_diag = n_diag >= DIAG_PRECOMPUTE_MIN_TERMS

        for m_full, perm_mask, signs, coeffs in plan.groups:
            terms = []
            is_diag_group = (perm_mask == 0) and self.use_diag
            for s, c in zip(signs, coeffs):
                s_eff, const_sign = _effective_sign_mask(
                    int(s), int(m_full), left, right)
                cc = complex(c) * const_sign
                if is_diag_group:
                    diag_terms.append((cc.real, cc.imag, s_eff))
                    continue
                s_row = (s_eff >> LANE_BITS) & (R - 1)
                s_lane = s_eff & 127
                row_col = None
                if s_row:
                    row_col = len(wrow_cols)
                    wrow_cols.append(
                        (1.0 - 2.0 * parity_np(row_ids & s_row)
                         ).astype(np.float32))
                lane_row = None
                if s_lane:
                    lane_row = len(wlane_rows)
                    wlane_rows.append(
                        (1.0 - 2.0 * parity_np(lane_ids & s_lane)
                         ).astype(np.float32))
                terms.append(_KTerm(cc.real, cc.imag, s_eff >> bb,
                                    row_col, lane_row))
            if terms:
                groups.append((perm_mask >> bb,
                               (perm_mask >> LANE_BITS) & (R - 1),
                               perm_mask & 127,
                               terms))

        self.diag_terms = diag_terms
        self.use_diag = bool(diag_terms)
        self.has_imag_diag = any(ci != 0 for _, ci, _ in diag_terms)

        # runs: groups that share a block-level source offset
        by_blk = {}
        for g in groups:
            by_blk.setdefault(g[0], []).append(g)
        if self.use_diag:
            by_blk.setdefault(0, [])  # the diagonal reads the identity block
        self.runs = sorted(by_blk.items())
        self.run_index = {m_blk: i for i, (m_blk, _) in enumerate(self.runs)}

        # packed +-1 sign-factor tables (padded to tile boundaries)
        ncol = max(len(wrow_cols), 1)
        ncol_pad = -(-ncol // 128) * 128
        wrowT = np.ones((R, ncol_pad), np.float32)
        for c, v in enumerate(wrow_cols):
            wrowT[:, c] = v
        nrow = max(len(wlane_rows), 1)
        nrow_pad = -(-nrow // 8) * 8
        wlane = np.ones((nrow_pad, 128), np.float32)
        for r, v in enumerate(wlane_rows):
            wlane[r] = v
        self.wrowT = wrowT
        self.wlane = wlane


def compute_diagonal(diag_terms, dim, int_dtype, include_imag):
    """The precomputed diagonal stream: d[k] = sum_t c_t (-1)^parity(k&s_t),
    evaluated on device in one pass (reference: PrecomputeDiagonal,
    bpetsc_template_1.c:169-202)."""
    from .apply import _iota
    from .index_maps import parity_j

    @jax.jit
    def build():
        k = _iota(dim, int_dtype)
        dr = jnp.zeros(dim, jnp.float32)
        di = jnp.zeros(dim, jnp.float32) if include_imag else None
        for cr, ci, s_eff in diag_terms:
            w = (1 - 2 * parity_j(k & jnp.asarray(s_eff, int_dtype))
                 ).astype(jnp.float32)
            if cr:
                dr = dr + np.float32(cr) * w
            if include_imag and ci:
                di = di + np.float32(ci) * w
        planes = [dr, di] if include_imag else [dr]
        return jnp.stack(planes)

    return build()


def build_pallas_apply(plan, left, right, block_bits=None, interpret=False):
    """Returns a traceable fn (2, dim) -> (2, dim) f32 running the Pallas
    kernel, or None if the plan is unsupported."""
    if not plan.xor_mode or plan.dim_left != plan.dim_right:
        return None
    if plan.dim_right < (1 << MIN_BLOCK_BITS):
        return None
    if not plan.groups:
        return None
    if plan.int_dtype != np.int32:
        return None  # L > 31 runs in double precision on the XLA path
    if plan.use_scan:
        # many-mask operators (SYK: ~10k mask groups) would unroll into an
        # enormous kernel body and VMEM-resident sign tables; they take the
        # scan engine instead
        return None
    try:
        p = PallasXorPlan(plan, left, right, block_bits)
    except TypeError:
        return None

    R, B = p.R, p.B
    n_blocks = p.n_blocks
    runs = p.runs
    n_runs = len(runs)
    use_diag = p.use_diag
    diag_planes = (2 if p.has_imag_diag else 1) if use_diag else 0
    run0 = p.run_index.get(0)

    roll = jnp.roll if interpret else pltpu.roll

    def xor_perm(v, m_row, m_lane, sel_cache):
        """v[r ^ m_row, l ^ m_lane] over a (R, 128) tile."""
        for axis, m, size in ((1, m_lane, 128), (0, m_row, R)):
            for j in _bits(m):
                s = 1 << j
                key = (axis, j)
                if key not in sel_cache:
                    sel_cache[key] = (
                        lax.broadcasted_iota(jnp.int32, (R, 128), axis)
                        & s) != 0
                sel = sel_cache[key]
                v = jnp.where(sel, roll(v, s, axis), roll(v, size - s, axis))
        return v

    def kernel(*refs):
        x_refs = refs[:n_runs]
        pos = n_runs
        if use_diag:
            diag_ref = refs[pos]
            pos += 1
        wrowT_ref = refs[pos]
        wlane_ref = refs[pos + 1]
        y_ref = refs[pos + 2]

        i = pl.program_id(0)
        acc_r = jnp.zeros((R, 128), jnp.float32)
        acc_i = jnp.zeros((R, 128), jnp.float32)
        sel_cache = {}

        def term_factor(t):
            """(scalar, tile-or-None): the coefficient decomposition of one
            term; scalar folds the static coeff and the per-block sign."""
            if t.s_blk:
                # xor-fold parity of (i & s_blk) on the scalar core
                # (Mosaic has no scalar popcount)
                v = i & np.int32(t.s_blk)
                for sh in (16, 8, 4, 2, 1):
                    v = v ^ (v >> sh)
                wb = (1 - 2 * (v & 1)).astype(jnp.float32)
            else:
                wb = None
            tile = None
            if t.row_col is not None:
                tile = wrowT_ref[:, t.row_col:t.row_col + 1]
            if t.lane_row is not None:
                wl = wlane_ref[t.lane_row:t.lane_row + 1, :]
                tile = wl if tile is None else tile * wl
            return wb, tile

        for m_blk, groups in runs:
            tile_x = x_refs[p.run_index[m_blk]][...]
            xr, xi = tile_x[0], tile_x[1]

            if use_diag and m_blk == 0:
                d = diag_ref[...]
                dr = d[0]
                acc_r = acc_r + dr * xr
                acc_i = acc_i + dr * xi
                if diag_planes == 2:
                    di = d[1]
                    acc_r = acc_r - di * xi
                    acc_i = acc_i + di * xr

            for _, m_row, m_lane, terms in groups:
                if m_row or m_lane:
                    xpr = xor_perm(xr, m_row, m_lane, sel_cache)
                    xpi = xor_perm(xi, m_row, m_lane, sel_cache)
                else:
                    xpr, xpi = xr, xi

                # group coefficient tiles F = sum_t c_t * wb_t * tile_t
                Fr = None
                Fi = None
                for t in terms:
                    wb, tile = term_factor(t)
                    for c, attr in ((t.cr, 'r'), (t.ci, 'i')):
                        if c == 0:
                            continue
                        a = np.float32(c) if wb is None else np.float32(c) * wb
                        contrib = a if tile is None else a * tile
                        if attr == 'r':
                            Fr = contrib if Fr is None else Fr + contrib
                        else:
                            Fi = contrib if Fi is None else Fi + contrib

                if Fr is not None:
                    acc_r = acc_r + Fr * xpr
                    acc_i = acc_i + Fr * xpi
                if Fi is not None:
                    acc_r = acc_r - Fi * xpi
                    acc_i = acc_i + Fi * xpr

        y_ref[0] = acc_r
        y_ref[1] = acc_i

    # block specs over the (2, dim/128, 128) row-tiled view
    def _x_spec(m_blk):
        return pl.BlockSpec((2, R, 128), lambda i, mb=m_blk: (0, i ^ mb, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [_x_spec(m_blk) for m_blk, _ in runs]
    extra_args = []
    if use_diag:
        diag = compute_diagonal(p.diag_terms, p.dim, plan.int_dtype,
                                p.has_imag_diag)
        diag = diag.reshape(diag_planes, p.dim >> LANE_BITS, 128)
        in_specs.append(pl.BlockSpec((diag_planes, R, 128),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        extra_args.append(diag)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    extra_args.append(jnp.asarray(p.wrowT))
    extra_args.append(jnp.asarray(p.wlane))
    extra_tuple = tuple(extra_args)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, R, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, p.dim >> LANE_BITS, 128),
                                       jnp.float32),
        interpret=interpret,
    )

    def apply_fn(x):
        xv = x.reshape(2, p.dim >> LANE_BITS, 128)
        y = call(*((xv,) * n_runs + extra_tuple))
        return y.reshape(2, p.dim)

    apply_fn.pallas_plan = p
    return apply_fn
