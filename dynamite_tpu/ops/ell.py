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


def build_tables(plan, n_rows, real_dtype, out_shardings=None):
    """One jitted device pass computing the (cols, fr, fi) tables for rows
    [0, n_rows), already reshaped for the batched apply scan:
    cols (S, KB, n_rows) int, fr/fi (S, KB, n_rows) real. Rows >=
    plan.dim_left (uneven-sharding storage pad) get zero coefficients, as
    do group-batch pad slots.

    Returns (cols, fr, fi_or_None).
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
            col, valid = plan.right_map.s2i(bra)
            if valid_row is not None:
                valid = valid & valid_row
            ok = valid.astype(real_dtype)
            col = jnp.where(valid, col, 0)
            out = (col, fr * ok, fi * ok) if has_fi else (col, fr * ok)
            return None, out

        _, outs = lax.scan(step, None, (masks_d, signs_d, cr_d, ci_d))
        if has_fi:
            cols_c, fr_ck, fi_ck = outs
        else:
            (cols_c, fr_ck), fi_ck = outs, None

        # consolidate chunks into per-group rows, pad to the batch grid
        def consolidate(v):
            if C != G:
                v = jax.ops.segment_sum(v, jnp.asarray(gids),
                                        num_segments=G)
            if G_pad != G:
                v = jnp.pad(v, ((0, G_pad - G), (0, 0)))
            return v.reshape(S, KB, n_rows)

        cols_g = cols_c if C == G else cols_c[jnp.asarray(first)]
        if G_pad != G:
            cols_g = jnp.pad(cols_g, ((0, G_pad - G), (0, 0)))
        cols_g = cols_g.reshape(S, KB, n_rows)
        fr_g = consolidate(fr_ck)
        fi_g = consolidate(fi_ck) if has_fi else None
        out = (cols_g, fr_g, fi_g) if has_fi else (cols_g, fr_g)
        return out

    kwargs = {'out_shardings': out_shardings} \
        if out_shardings is not None else {}
    outs = jax.jit(build, **kwargs)()
    if has_fi:
        cols, fr, fi = outs
    else:
        (cols, fr), fi = outs, None
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
