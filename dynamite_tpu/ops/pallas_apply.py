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
over the blocked index k = (device, block, row, lane) with B = R*128
elements per block:

* mask device bits (m >> local_bits, distributed case): handled OUTSIDE the
  kernel by a pairwise lax.ppermute per distinct device mask — the TPU
  analog of the reference's rank = high-bits trick
  (bpetsc_template_2.c:781-783); the kernel receives one source operand per
  distinct device mask;
* mask block bits: handled by the BlockSpec index map — output block i
  reads source block i ^ m_blk of the right source operand, one
  auto-pipelined DMA per distinct (device-mask, m_blk) "run", shared by
  every group in the run;
* mask row bits: XOR permutation along sublanes — per set bit, two
  pltpu.rolls + a select (a roll by a multiple of 8 sublanes is a vreg
  renumbering, smaller shifts are sublane shuffles);
* mask lane bits: the same roll+select construction along lanes;
* sign device bits (distributed case): a per-term scalar
  (-1)^parity(me & s_dev) that depends on the runtime device index — passed
  into the kernel as a small SMEM vector of +-1 factors (one per distinct
  device sign mask), computed by the shard_map wrapper;
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
    __slots__ = ('cr', 'ci', 's_blk', 'row_col', 'lane_row', 'wd_idx')

    def __init__(self, cr, ci, s_blk, row_col, lane_row, wd_idx):
        self.cr = cr            # static real coefficient (incl. const sign)
        self.ci = ci
        self.s_blk = s_blk      # sign mask over block bits (static int)
        self.row_col = row_col  # column in WrowT, or None (no row factor)
        self.lane_row = lane_row  # row in Wlane, or None (no lane factor)
        self.wd_idx = wd_idx    # index into the runtime device-sign vector
        #                         (distributed case), or None


class PallasXorPlan:
    """Host-side decomposition of an apply-plan into kernel structure.

    ``device_bits`` > 0 decomposes for the distributed case: the kernel
    then operates on each device's local block of 2**(nbits - device_bits)
    rows, mask device bits select the ppermute source operand, and sign
    device bits index the runtime +-1 vector (see module docstring).
    """

    def __init__(self, plan, left, right, block_bits=None, device_bits=0):
        nbits = plan.dim_right.bit_length() - 1
        self.dim = plan.dim_right
        self.nbits = nbits
        self.device_bits = device_bits
        self.local_bits = nbits - device_bits
        self.local_dim = 1 << self.local_bits

        # the passed block_bits is an upper bound; the VMEM budget can lower
        # it (many-run operators like long_range exceed the ~16 MB/core at
        # the largest block)
        if block_bits is None:
            block_bits = MAX_BLOCK_BITS
        block_bits = min(block_bits, self.local_bits)
        while (block_bits > MIN_BLOCK_BITS
               and self._vmem_estimate(plan, block_bits,
                                       self.local_bits) > VMEM_BUDGET):
            block_bits -= 1
        self.block_bits = min(block_bits, self.local_bits)
        B = 1 << self.block_bits
        self.B = B
        self.R = B >> LANE_BITS
        self.n_blocks = self.local_dim // B

        self._decompose(plan, left, right)

    @staticmethod
    def _runs_at(plan, block_bits, local_bits):
        local_mask = (1 << local_bits) - 1
        keys = {(g[1] >> local_bits, (g[1] & local_mask) >> block_bits)
                for g in plan.groups}
        keys.add((0, 0))
        return len(keys)

    @classmethod
    def _vmem_estimate(cls, plan, block_bits, local_bits):
        B = 1 << block_bits
        block_bytes = 2 * B * 4          # (2, R, 128) f32
        n_runs = cls._runs_at(plan, block_bits, local_bits)
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
        lb = self.local_bits
        local_mask = self.local_dim - 1

        diag_terms = []          # (cr, ci, s_eff)
        groups = []              # (m_hi, m_blk, m_row, m_lane, [_KTerm])
        wrow_cols = []           # columns of WrowT
        wlane_rows = []          # rows of Wlane
        dev_masks = []           # distinct device sign masks (runtime +-1s)
        dev_index = {}
        row_ids = np.arange(R)
        lane_ids = np.arange(128)

        # count diagonal terms first to decide on precomputation
        n_diag = sum(len(g[2]) for g in plan.groups if g[1] == 0)
        self.use_diag = n_diag >= DIAG_PRECOMPUTE_MIN_TERMS

        for m_full, perm_mask, signs, coeffs in plan.groups:
            terms = []
            is_diag_group = (perm_mask == 0) and self.use_diag
            m_hi = perm_mask >> lb
            m_local = perm_mask & local_mask
            for s, c in zip(signs, coeffs):
                s_eff, const_sign = _effective_sign_mask(
                    int(s), int(m_full), left, right)
                cc = complex(c) * const_sign
                if is_diag_group:
                    diag_terms.append((cc.real, cc.imag, s_eff))
                    continue
                s_dev = s_eff >> lb
                wd_idx = None
                if s_dev:
                    if s_dev not in dev_index:
                        dev_index[s_dev] = len(dev_masks)
                        dev_masks.append(s_dev)
                    wd_idx = dev_index[s_dev]
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
                terms.append(_KTerm(cc.real, cc.imag,
                                    (s_eff & local_mask) >> bb,
                                    row_col, lane_row, wd_idx))
            if terms:
                groups.append((m_hi,
                               m_local >> bb,
                               (m_local >> LANE_BITS) & (R - 1),
                               m_local & 127,
                               terms))

        self.diag_terms = diag_terms
        self.use_diag = bool(diag_terms)
        self.has_imag_diag = any(ci != 0 for _, ci, _ in diag_terms)
        self.dev_masks = dev_masks

        # runs: groups that share a (device mask, block offset) source
        by_run = {}
        for g in groups:
            by_run.setdefault((g[0], g[1]), []).append(g)
        if self.use_diag:
            by_run.setdefault((0, 0), [])  # the diagonal reads the identity
        self.runs = sorted(by_run.items())
        self.run_index = {key: i for i, (key, _) in enumerate(self.runs)}
        self.hi_list = sorted({key[0] for key, _ in self.runs})

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


def _supported(plan):
    """Shared eligibility guards for the Pallas builders."""
    if not plan.xor_mode or plan.dim_left != plan.dim_right:
        return False
    if not plan.groups:
        return False
    if plan.int_dtype != np.int32:
        return False  # L > 31 runs in double precision on the XLA path
    if plan.use_scan:
        # many-mask operators (SYK: ~10k mask groups) would unroll into an
        # enormous kernel body and VMEM-resident sign tables; they take the
        # scan/ELL engines instead
        return False
    return True


def _build_call(p, interpret):
    """The pallas_call for a decomposed plan: returns
    call_fn(srcs_by_hi, diag_tile_or_None, wd_or_None) -> (2, rows, 128),
    where srcs_by_hi maps each device mask in p.hi_list to a
    (2, local_rows, 128) array and wd is the (n_dev_masks,) runtime +-1
    vector ((1,) dummy accepted when p.dev_masks is empty)."""
    R = p.R
    runs = p.runs
    n_runs = len(runs)
    use_diag = p.use_diag
    diag_planes = (2 if p.has_imag_diag else 1) if use_diag else 0
    use_wd = bool(p.dev_masks)
    n_wd = max(len(p.dev_masks), 1)

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
        if use_wd:
            wd_ref = refs[pos]
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
            term; scalar folds the static coeff, the per-block sign, and
            (distributed) the runtime device sign."""
            wb = None
            if t.s_blk:
                # xor-fold parity of (i & s_blk) on the scalar core
                # (Mosaic has no scalar popcount)
                v = i & np.int32(t.s_blk)
                for sh in (16, 8, 4, 2, 1):
                    v = v ^ (v >> sh)
                wb = (1 - 2 * (v & 1)).astype(jnp.float32)
            if t.wd_idx is not None:
                w_dev = wd_ref[t.wd_idx]
                wb = w_dev if wb is None else wb * w_dev
            tile = None
            if t.row_col is not None:
                tile = wrowT_ref[:, t.row_col:t.row_col + 1]
            if t.lane_row is not None:
                wl = wlane_ref[t.lane_row:t.lane_row + 1, :]
                tile = wl if tile is None else tile * wl
            return wb, tile

        for (m_hi, m_blk), groups in runs:
            tile_x = x_refs[p.run_index[(m_hi, m_blk)]][...]
            xr, xi = tile_x[0], tile_x[1]

            if use_diag and (m_hi, m_blk) == (0, 0):
                d = diag_ref[...]
                dr = d[0]
                acc_r = acc_r + dr * xr
                acc_i = acc_i + dr * xi
                if diag_planes == 2:
                    di = d[1]
                    acc_r = acc_r - di * xi
                    acc_i = acc_i + di * xr

            for _, _, m_row, m_lane, terms in groups:
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

    # block specs over the (2, local_rows, 128) row-tiled view
    def _x_spec(m_blk):
        return pl.BlockSpec((2, R, 128), lambda i, mb=m_blk: (0, i ^ mb, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [_x_spec(m_blk) for (_, m_blk), _ in runs]
    if use_diag:
        in_specs.append(pl.BlockSpec((diag_planes, R, 128),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
    if use_wd:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        grid=(p.n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, R, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, p.local_dim >> LANE_BITS, 128),
                                       jnp.float32),
        interpret=interpret,
    )

    wrowT = jnp.asarray(p.wrowT)
    wlane = jnp.asarray(p.wlane)

    def call_fn(srcs_by_hi, diag_tile, wd):
        args = [srcs_by_hi[m_hi] for (m_hi, _), _ in runs]
        if use_diag:
            args.append(diag_tile)
        if use_wd:
            args.append(wd)
        args.append(wrowT)
        args.append(wlane)
        return call(*args)

    return call_fn


def build_pallas_apply(plan, left, right, block_bits=None, interpret=False):
    """Returns a traceable fn (2, dim) -> (2, dim) f32 running the
    single-device Pallas kernel, or None if the plan is unsupported."""
    if not _supported(plan):
        return None
    if plan.dim_right < (1 << MIN_BLOCK_BITS):
        return None
    try:
        p = PallasXorPlan(plan, left, right, block_bits)
    except TypeError:
        return None

    call_fn = _build_call(p, interpret)
    if p.use_diag:
        diag = compute_diagonal(p.diag_terms, p.dim, plan.int_dtype,
                                p.has_imag_diag)
        diag = diag.reshape(-1, p.dim >> LANE_BITS, 128)
    else:
        diag = None

    def apply_fn(x):
        xv = x.reshape(2, p.dim >> LANE_BITS, 128)
        y = call_fn({0: xv}, diag, None)
        return y.reshape(2, p.dim)

    apply_fn.pallas_plan = p
    return apply_fn


def build_pallas_sharded_parts(plan, left, right, device_bits,
                               block_bits=None, interpret=False):
    """Decompose for the distributed case: the kernel runs on each device's
    local block inside shard_map, with the mask device bits handled by
    ppermute outside (reference bar: the distributed fast path,
    bpetsc_template_2.c:713-889).

    Returns None when unsupported, else a dict with

    * ``plan``: the PallasXorPlan (hi_list = device masks to ppermute,
      dev_masks = device sign masks needing runtime +-1 factors)
    * ``diag``: the global (planes, dim/128, 128) diagonal stream or None
    * ``call_fn(srcs_by_hi, diag_tile, wd)``: the local kernel invocation
      (diag_tile is this device's slice; wd the runtime +-1 vector).
    """
    if not _supported(plan):
        return None
    local_dim = plan.dim_right >> device_bits
    if local_dim < (1 << MIN_BLOCK_BITS):
        return None
    try:
        p = PallasXorPlan(plan, left, right, block_bits,
                          device_bits=device_bits)
    except TypeError:
        return None

    call_fn = _build_call(p, interpret)
    if p.use_diag:
        diag = compute_diagonal(p.diag_terms, p.dim, plan.int_dtype,
                                p.has_imag_diag)
        diag = diag.reshape(-1, p.dim >> LANE_BITS, 128)
    else:
        diag = None

    return {'plan': p, 'diag': diag, 'call_fn': call_fn}
