"""
Semi-explicit ELL-format apply engine for general subspace pairs.

For a fixed (msc, left, right) triple, the column index of every nonzero is
a *static* function of the row: col = s2i_right(i2s_left(row) ^ mask), and
so is the Walsh coefficient f_m(bra). Computing them on the fly (the XLA
engine's general path) scalarizes the combinatorial ranking on TPU —
measured ~100x slower than the gathers themselves. This engine precomputes
both once at kernel-build time, ON DEVICE (one jitted pass reusing the same
traced index maps — no host round-trip), and the hot apply becomes a scan
of pure gather+FMA steps:

    y += (fr[g] + i fi[g]) * x[:, cols[g]]      for each mask group g

This is the TPU analog of the reference's explicit CSR mode (BuildPetsc,
bpetsc_template_2.c:57-205): a materialized matrix in ELL layout (one
permutation-structured column block per Pauli mask group), chosen over CSR
because every row has the same group structure. Memory: one int + one or
two floats per (row, group), bounded by config.ell_budget (the matrix-free
on-the-fly engine remains the fallback above the budget).

Many-group operators (SYK: ~10k masks) batch several groups per scan step
so the scan trip count stays bounded; the per-step gather then moves a
(KB, dim) block.

The tables are device arrays captured by closure in the returned traceable;
every jit entry point in this package hoists such captures to runtime
arguments (utils/hoist.py) — inlining them as MLIR constants would make
compile payloads explode.

The sharded variant stores only the rows each device owns (tables sharded
over the state axis) and all-gathers x over ICI — the same communication
pattern as the on-the-fly sharded general path (apply.py), with the sweep
replaced by gathers.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_ELL_BUDGET = 4 << 30  # bytes of device memory for the tables
TERM_CHUNK = 8                # terms per build step (matches apply.py)
MAX_SCAN_STEPS = 128          # target bound on apply scan trip count


def ell_budget():
    from .. import config
    return getattr(config, 'ell_budget', DEFAULT_ELL_BUDGET)


def ell_enabled():
    from .. import config
    return getattr(config, 'use_ell', True)


def chunk_groups(groups):
    """Split mask groups into <=TERM_CHUNK-term build chunks, tracking which
    group each chunk belongs to. Returns (masks, signs, crs, cis, gids, G).
    """
    masks, signs, crs, cis, gids = [], [], [], [], []
    for g, (m, _perm, s, c) in enumerate(groups):
        for start in range(0, len(s), TERM_CHUNK):
            s_pad = np.zeros(TERM_CHUNK, dtype=np.int64)
            c_pad = np.zeros(TERM_CHUNK, dtype=np.complex128)
            piece_s = s[start:start + TERM_CHUNK]
            piece_c = c[start:start + TERM_CHUNK]
            s_pad[:len(piece_s)] = piece_s
            c_pad[:len(piece_c)] = piece_c
            masks.append(int(m))
            signs.append(s_pad)
            crs.append(c_pad.real.copy())
            cis.append(c_pad.imag.copy())
            gids.append(g)
    return (np.asarray(masks, dtype=np.int64), np.stack(signs),
            np.stack(crs), np.stack(cis),
            np.asarray(gids, dtype=np.int32), len(groups))


def table_bytes(plan, storage_rows=None):
    """Estimated table memory for a plan (mesh-wide; the sharded variant
    splits this across devices)."""
    rows = storage_rows if storage_rows is not None else plan.dim_left
    idx_bytes = 4 if plan.int_dtype == np.int32 else 8
    # cols + fr (+ fi when any group has imaginary coefficients)
    return len(plan.groups) * rows * (idx_bytes + 4 + 4)


def _batch(G):
    """(n_steps, KB) batching of G groups for the apply scan."""
    kb = -(-G // MAX_SCAN_STEPS)
    return -(-G // kb), kb


def build_tables(plan, n_rows, real_dtype, out_shardings=None,
                 with_conserves=False):
    """One jitted device pass computing the (cols, fr, fi) tables for rows
    [0, n_rows), already reshaped for the batched apply scan:
    cols (S, KB, n_rows) int, fr/fi (S, KB, n_rows) real. Rows >=
    plan.dim_left (uneven-sharding storage pad) get zero coefficients, as
    do group-batch pad slots.

    ``with_conserves`` additionally returns the conservation flag — every
    row's every non-cancelling mask image lands inside the right subspace —
    as a byproduct of the same pass (for Hermitian operators on a square
    pair this equals the reference's column-wise CheckConserves,
    bpetsc_template_2.c:990-1056), saving the separate device reduction.

    Returns (cols, fr, fi_or_None[, conserves_bool]).
    """
    from .apply import _iota
    from .index_maps import parity_j

    masks_c, signs_c, cr_c, ci_c, gids, G = chunk_groups(plan.groups)
    C = len(masks_c)
    has_fi = bool(np.any(ci_c != 0))
    idt = plan.int_dtype
    dim_left = plan.dim_left
    S, KB = _batch(G)
    G_pad = S * KB
    # roundoff threshold for "this row's group coefficient cancels" (exact
    # symbolic cancellations survive as float residue, e.g. in folded
    # operators) — relative to each chunk's coefficient scale
    chunk_scale = (np.abs(cr_c) + np.abs(ci_c)).sum(axis=1)
    # row index of the first chunk of each group (its cols row is the
    # group's cols row; duplicates within a group are identical)
    first = np.full(G, -1, dtype=np.int64)
    for c, g in enumerate(gids):
        if first[g] < 0:
            first[g] = c

    def build():
        rows = _iota(n_rows, idt)
        if n_rows != dim_left:
            valid_row = rows < dim_left
            rows = jnp.minimum(rows, dim_left - 1)
        else:
            valid_row = None
        row_states = plan.row_states(rows)

        masks_d = jnp.asarray(masks_c, idt)
        signs_d = jnp.asarray(signs_c, idt)
        cr_d = jnp.asarray(cr_c, real_dtype)
        ci_d = jnp.asarray(ci_c, real_dtype)

        def step(_, args):
            m, signs, cr, ci = args
            bra = row_states ^ m
            w = (1 - 2 * parity_j(bra[:, None] & signs[None, :])
                 ).astype(real_dtype)
            fr = w @ cr
            fi = w @ ci
            col, sub_valid = plan.right_map.s2i(bra)
            valid = sub_valid
            if valid_row is not None:
                valid = valid & valid_row
            ok = valid.astype(real_dtype)
            col = jnp.where(valid, col, 0)
            out = [col, fr * ok]
            if has_fi:
                out.append(fi * ok)
            if with_conserves:
                # raw (unmasked, signed) coefficients: the conservation
                # test must see the value a row would have had outside the
                # subspace, summed over the whole group before |.|. Storage
                # pad rows auto-pass (they are not physical rows).
                test_valid = sub_valid
                if valid_row is not None:
                    test_valid = sub_valid | ~valid_row
                out.append(test_valid)
                out.append(fr)
                if has_fi:
                    out.append(fi)
            return None, tuple(out)

        _, outs = lax.scan(step, None, (masks_d, signs_d, cr_d, ci_d))
        outs = list(outs)
        fi_raw_c = outs.pop() if (with_conserves and has_fi) else None
        fr_raw_c = outs.pop() if with_conserves else None
        valid_c = outs.pop() if with_conserves else None
        cols_c = outs[0]
        fr_ck = outs[1]
        fi_ck = outs[2] if has_fi else None

        # consolidate chunks into per-group rows, pad to the batch grid
        def to_groups(v, take_first=False):
            if C != G:
                if take_first:
                    v = v[jnp.asarray(first)]
                else:
                    v = jax.ops.segment_sum(v, jnp.asarray(gids),
                                            num_segments=G)
            return v

        def batch_pad(v):
            if G_pad != G:
                v = jnp.pad(v, ((0, G_pad - G), (0, 0)))
            return v.reshape(S, KB, n_rows)

        cols_g = batch_pad(to_groups(cols_c, take_first=True))
        fr_gt = to_groups(fr_ck)
        fi_gt = to_groups(fi_ck) if has_fi else None

        conserved = None
        if with_conserves:
            # every row of every group must either land inside the right
            # subspace or have a (numerically) cancelling coefficient
            gscale = np.zeros(G)
            np.add.at(gscale, gids, chunk_scale)
            tol = jnp.asarray(1e-12 * gscale, real_dtype)[:, None]
            mag = jnp.abs(to_groups(fr_raw_c))
            if has_fi:
                mag = mag + jnp.abs(to_groups(fi_raw_c))
            gvalid = to_groups(valid_c, take_first=True)
            conserved = jnp.all(gvalid | (mag <= tol))

        fr_g = batch_pad(fr_gt)
        fi_g = batch_pad(fi_gt) if has_fi else None
        out = [cols_g, fr_g]
        if has_fi:
            out.append(fi_g)
        if with_conserves:
            out.append(conserved)
        return tuple(out)

    kwargs = {}
    if out_shardings is not None:
        n_tables = 3 if has_fi else 2
        specs = (out_shardings,) * n_tables
        if with_conserves:
            from jax.sharding import NamedSharding, PartitionSpec
            specs = specs + (NamedSharding(out_shardings.mesh,
                                           PartitionSpec()),)
        kwargs['out_shardings'] = specs
    outs = list(jax.jit(build, **kwargs)())
    conserved = bool(outs.pop()) if with_conserves else None
    cols, fr = outs[0], outs[1]
    fi = outs[2] if has_fi else None
    if with_conserves:
        return cols, fr, fi, conserved
    return cols, fr, fi


def make_apply(out_rows, has_fi, vary_axis=None):
    """The traceable ELL apply (tables passed as arguments so the sharded
    wrapper can shard them): apply(x, cols, fr[, fi]) -> y (2, out_rows).

    A lax.scan over group batches; each step is one (KB, rows) gather +
    contraction. Measured on TPU the scan form matches the unrolled form
    (both bound by gather throughput) while keeping the program size O(1)
    in the group count.
    """
    def apply_fn(x, cols, fr, fi=None):
        dtype = x.dtype
        y0 = jnp.zeros((2, out_rows), dtype)
        if vary_axis is not None:
            # inside shard_map the carry becomes device-varying on the
            # first step; mark the initial zeros to match
            if hasattr(lax, 'pcast'):
                y0 = lax.pcast(y0, (vary_axis,), to='varying')
            elif hasattr(lax, 'pvary'):
                y0 = lax.pvary(y0, (vary_axis,))

        if not has_fi:
            def step(y, args):
                c, f = args                      # (KB, rows)
                xp = x[:, c]                     # (2, KB, rows)
                return y + jnp.einsum('kr,pkr->pr', f, xp), None
            xs = (cols, fr)
        else:
            def step(y, args):
                c, f_r, f_i = args
                xp = x[:, c]
                sr = jnp.einsum('kr,kr->r', f_r, xp[0]) \
                    - jnp.einsum('kr,kr->r', f_i, xp[1])
                si = jnp.einsum('kr,kr->r', f_r, xp[1]) \
                    + jnp.einsum('kr,kr->r', f_i, xp[0])
                return y + jnp.stack([sr, si]), None
            xs = (cols, fr, fi)

        y, _ = lax.scan(step, y0, xs)
        return y

    return apply_fn


# --------------------------------------------------------------------------
# Adjacent-shift engine: SpinConserve pairs whose masks act on adjacent bit
# pairs (XX/XXZ/Heisenberg/MBL chains — the workhorse models). For the mask
# m = 3 << i on a fixed-popcount ranking, the column offset col - row takes
# only the values +-C(i, t) with t = popcount(state below bit i): moving
# the 1 from bit i to bit i+1 raises the rank by C(i+1, t+1) - C(i, t+1)
# = C(i, t). The gather therefore decomposes into a STATIC schedule of
# rolls with class-masked FMAs — pure streaming VPU work, where a real
# gather on TPU runs at ~1.5 GB/s (measured: 350 ms/apply at L=24).
# --------------------------------------------------------------------------

SHIFT_INVALID = 127  # class code for rows the mask maps outside the sector


def shift_schedule(plan, left, right):
    """The static (per-group class -> roll offset) schedule, or None when
    the plan is not an adjacent-pair SpinConserve operator."""
    from .. import subspaces as sp
    if not (isinstance(left, sp.SpinConserve)
            and isinstance(right, sp.SpinConserve)):
        return None
    if left.L != right.L or left.k != right.k:
        return None
    L, k = left.L, left.k
    if k < 1 or k > L - 1:
        return None
    nck = left.nchoosek  # nck[kk, n] = C(n, kk)

    schedules = []
    for m, _perm, _signs, _coeffs in plan.groups:
        m = int(m)
        if m == 0:
            schedules.append((None, [(0, 0)]))  # diagonal: one class, d=0
            continue
        # exactly two set bits, adjacent
        i = (m & -m).bit_length() - 1
        if m != (3 << i) or i + 1 >= L:
            return None
        t_lo = max(0, k - 1 - (L - i - 2))
        t_hi = min(i, k - 1)
        sched = []
        for t in range(t_lo, t_hi + 1):
            d = int(nck[t, i]) if t <= k else 0  # C(i, t)
            sched.append((2 * t, +d))
            sched.append((2 * t + 1, -d))
        if 2 * t_hi + 1 >= SHIFT_INVALID:
            return None  # class code must fit the int8 table
        schedules.append((i, sched))
    return schedules


def shift_table_bytes(plan, storage_rows=None):
    rows = storage_rows if storage_rows is not None else plan.dim_left
    # one int8 class id + one or two f32 coefficients per (row, group)
    return len(plan.groups) * rows * (1 + 4 + 4)


def build_shift_tables(plan, schedules, n_rows, real_dtype,
                       out_shardings=None, with_conserves=False):
    """One jitted device pass: per-group class-id tables (int8) and the
    consolidated Walsh coefficient tables. Returns
    (cls (G, n_rows) int8, fr, fi_or_None[, conserved])."""
    from .apply import _iota
    from .index_maps import parity_j

    masks_c, signs_c, cr_c, ci_c, gids, G = chunk_groups(plan.groups)
    C = len(masks_c)
    has_fi = bool(np.any(ci_c != 0))
    idt = plan.int_dtype
    dim_left = plan.dim_left
    chunk_scale = (np.abs(cr_c) + np.abs(ci_c)).sum(axis=1)
    first = np.full(G, -1, dtype=np.int64)
    for c, g in enumerate(gids):
        if first[g] < 0:
            first[g] = c

    def build():
        rows = _iota(n_rows, idt)
        if n_rows != dim_left:
            valid_row = rows < dim_left
            rows = jnp.minimum(rows, dim_left - 1)
        else:
            valid_row = None
        row_states = plan.row_states(rows)

        masks_d = jnp.asarray(masks_c, idt)
        signs_d = jnp.asarray(signs_c, idt)
        cr_d = jnp.asarray(cr_c, real_dtype)
        ci_d = jnp.asarray(ci_c, real_dtype)

        # class-id tables per GROUP (static python loop: G is small for
        # chain models)
        cls_list = []
        for bit, _sched in schedules:
            if bit is None:
                cls = jnp.zeros(n_rows, jnp.int8)
                if valid_row is not None:
                    cls = jnp.where(valid_row, cls,
                                    jnp.int8(SHIFT_INVALID))
            else:
                below = lax.population_count(
                    row_states & jnp.asarray((1 << bit) - 1, idt)
                ).astype(jnp.int32)
                b_i = (row_states >> bit) & 1
                b_j = (row_states >> (bit + 1)) & 1
                up = (b_i == 1) & (b_j == 0)
                down = (b_i == 0) & (b_j == 1)
                cls = jnp.where(
                    up, 2 * below,
                    jnp.where(down, 2 * below + 1, SHIFT_INVALID)
                ).astype(jnp.int8)
                if valid_row is not None:
                    cls = jnp.where(valid_row, cls,
                                    jnp.int8(SHIFT_INVALID))
            cls_list.append(cls)
        cls_g = jnp.stack(cls_list)

        def step(_, args):
            m, signs, cr, ci = args
            bra = row_states ^ m
            w = (1 - 2 * parity_j(bra[:, None] & signs[None, :])
                 ).astype(real_dtype)
            out = [w @ cr]
            if has_fi:
                out.append(w @ ci)
            return None, tuple(out)

        _, outs = lax.scan(step, None, (masks_d, signs_d, cr_d, ci_d))

        def to_groups(v):
            if C != G:
                v = jax.ops.segment_sum(v, jnp.asarray(gids),
                                        num_segments=G)
            return v

        fr_g = to_groups(outs[0])
        fi_g = to_groups(outs[1]) if has_fi else None

        conserved = None
        if with_conserves:
            gscale = np.zeros(G)
            np.add.at(gscale, gids, chunk_scale)
            tol = jnp.asarray(1e-12 * gscale, real_dtype)[:, None]
            mag = jnp.abs(fr_g)
            if has_fi:
                mag = mag + jnp.abs(fi_g)
            invalid = cls_g == SHIFT_INVALID
            if valid_row is not None:
                invalid = invalid & valid_row[None, :]  # pad rows exempt
            conserved = jnp.all(~invalid | (mag <= tol))

        # per-group constancy of the coefficient over its valid rows: for
        # XX/YY chains the off-diagonal Walsh factor is the same on every
        # allowed transition, so the apply can fold it into a static scalar
        # and skip the whole F stream
        validg = cls_g != SHIFT_INVALID
        if valid_row is not None:
            validg = validg & valid_row[None, :]
        big = jnp.asarray(np.finfo(np.dtype(real_dtype)).max, real_dtype)
        fmax = jnp.max(jnp.where(validg, fr_g, -big), axis=1)
        fmin = jnp.min(jnp.where(validg, fr_g, big), axis=1)
        if has_fi:
            gmax = jnp.max(jnp.where(validg, fi_g, -big), axis=1)
            gmin = jnp.min(jnp.where(validg, fi_g, big), axis=1)
        else:
            gmax = gmin = jnp.zeros_like(fmax)

        # zero the coefficients of invalid (and pad) rows so the apply
        # needs no separate mask
        ok = validg.astype(real_dtype)
        fr_g = fr_g * ok
        if has_fi:
            fi_g = fi_g * ok

        out = [cls_g, fr_g]
        if has_fi:
            out.append(fi_g)
        out.append(jnp.stack([fmax, fmin, gmax, gmin]))
        if with_conserves:
            out.append(conserved)
        return tuple(out)

    kwargs = {}
    if out_shardings is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(out_shardings.mesh, PartitionSpec())
        n_tables = 3 if has_fi else 2
        specs = (out_shardings,) * n_tables + (repl,)
        if with_conserves:
            specs = specs + (repl,)
        kwargs['out_shardings'] = specs
    outs = list(jax.jit(build, **kwargs)())
    conserved = bool(outs.pop()) if with_conserves else None
    stats = np.asarray(outs.pop(), dtype=np.float64)  # (4, G) minmax
    cls, fr = outs[0], outs[1]
    fi = outs[2] if has_fi else None

    # static per-group constant coefficients (or None): constancy needs the
    # spread small relative to the magnitude
    fconst = []
    for g in range(stats.shape[1]):
        fmax, fmin, gmax, gmin = stats[:, g]
        if fmax < fmin:  # no valid rows at all
            fconst.append((0.0, 0.0))
            continue
        scale = max(abs(fmax), abs(fmin), abs(gmax), abs(gmin), 1e-300)
        if (fmax - fmin) <= 1e-12 * scale and \
                (gmax - gmin) <= 1e-12 * scale:
            fconst.append((float(fmax), float(gmax)))
        else:
            fconst.append(None)

    # on multi-host meshes the constancy decision must agree everywhere
    # (it is derived from device data); it does, deterministically, since
    # every process computes the same global reduction.
    if with_conserves:
        return cls, fr, fi, fconst, conserved
    return cls, fr, fi, fconst


# row-chunk size of the chunked shift apply (the same fusion-cliff
# avoidance as apply._build_local_chunked)
SHIFT_CHUNK_BITS = 20


def _shift_sweep(xs_fn, cls_rows, fr_rows, fi_rows, fconst, schedules,
                 dtype):
    """The class sweep shared by the shift-apply variants: xs_fn(d) yields
    the d-shifted state window aligned with the table rows."""
    shape = cls_rows[0].shape
    yr = jnp.zeros(shape, dtype)
    yi = jnp.zeros(shape, dtype)
    for g, (_bit, sched) in enumerate(schedules):
        c = cls_rows[g]
        const = fconst[g] if fconst is not None else None
        f_r = None if const is not None else fr_rows[g]
        f_i = None if (const is not None or fi_rows is None) \
            else fi_rows[g]
        for code, d in sched:
            sel = (c == code).astype(dtype)
            xs = xs_fn(d)
            if const is not None:
                cr, ci = const
                if cr != 0:
                    yr = yr + (cr * sel) * xs[0]
                    yi = yi + (cr * sel) * xs[1]
                if ci != 0:
                    yr = yr - (ci * sel) * xs[1]
                    yi = yi + (ci * sel) * xs[0]
                continue
            fr_sel = f_r * sel
            yr = yr + fr_sel * xs[0]
            yi = yi + fr_sel * xs[1]
            if f_i is not None:
                fi_sel = f_i * sel
                yr = yr - fi_sel * xs[1]
                yi = yi + fi_sel * xs[0]
    return jnp.stack([yr, yi])


def make_shift_apply(schedules, dim_right, has_fi, local_rows=None,
                     axis=None, fconst=None, n_rows=None):
    """The traceable shift-class apply: apply(x, cls, fr[, fi]) -> y.

    Per (group, class): one shifted read of the state at the static offset
    and one class-masked FMA — all streaming ops. Groups with a constant
    coefficient (``fconst[g]`` set) skip the F stream entirely.

    Local variant: rows are processed in SHIFT_CHUNK-sized pieces; each
    shifted read is then a contiguous slice of a padded copy of x, which
    XLA fuses into the chunk body instead of materializing one full-size
    rolled array per class. ``n_rows`` is the (padded) table length.

    Sharded variant (``local_rows``/``axis`` given): runs inside
    shard_map — x is the full gathered (padded) vector, the tables hold
    only this device's rows, and each rolled stream is sliced at the
    device's row offset.
    """
    max_d = max((abs(d) for _b, sched in schedules for _c, d in sched),
                default=0)

    def apply_fn(x, cls, fr, fi=None):
        dtype = x.dtype
        if local_rows is not None:
            # sharded: full gathered x, local table rows
            xg = x[:, :dim_right]
            me = lax.axis_index(axis)
            sdim = x.shape[-1]

            def shifted(d):
                xs = xg if d == 0 else jnp.roll(xg, -d, axis=1)
                if sdim != dim_right:
                    xs = jnp.pad(xs, ((0, 0), (0, sdim - dim_right)))
                zero = jnp.zeros((), me.dtype)
                return lax.dynamic_slice(
                    xs, (zero, me * jnp.asarray(local_rows, me.dtype)),
                    (2, local_rows))

            return _shift_sweep(shifted, cls, fr, fi, fconst, schedules,
                                dtype)

        rows = n_rows if n_rows is not None else dim_right
        C = min(1 << SHIFT_CHUNK_BITS, rows)
        n_chunks = rows // C
        if n_chunks <= 1:
            def shifted(d):
                xs = x if d == 0 else jnp.roll(x, -d, axis=1)
                if rows != dim_right:
                    xs = jnp.pad(xs, ((0, 0), (0, rows - dim_right)))
                return xs
            y = _shift_sweep(shifted, cls, fr, fi, fconst, schedules,
                             dtype)
            return y[:, :dim_right]

        # chunked: pad x so every shifted window is a plain slice
        xpad = jnp.pad(x, ((0, 0), (max_d, max_d + rows - dim_right)))

        def body(c, _):
            base = c * jnp.asarray(C, jnp.int32)
            zero = jnp.zeros((), jnp.int32)

            def shifted(d):
                return lax.dynamic_slice(
                    xpad, (zero, base + jnp.asarray(d + max_d, jnp.int32)),
                    (2, C))

            cls_c = [lax.dynamic_slice(cls[g], (base,), (C,))
                     for g in range(len(schedules))]
            fr_c = [lax.dynamic_slice(fr[g], (base,), (C,))
                    for g in range(len(schedules))]
            fi_c = None if fi is None else \
                [lax.dynamic_slice(fi[g], (base,), (C,))
                 for g in range(len(schedules))]
            y = _shift_sweep(shifted, cls_c, fr_c, fi_c, fconst,
                             schedules, dtype)
            return c + 1, y

        _, ys = lax.scan(body, jnp.asarray(0, jnp.int32), None,
                         length=n_chunks)
        return jnp.moveaxis(ys, 0, 1).reshape(2, rows)[:, :dim_right]

    return apply_fn
