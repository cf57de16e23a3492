"""
Reduced density matrices.

The state, viewed as a [2]*L tensor over the spins, is transposed so the
kept spins lead, reshaped to (2^k, 2^(L-k)), and contracted
rho = V V^dagger. For subspace states the amplitudes are first scattered
into the full space through the subspace's index map.

Bit convention: spin i is bit i (LSB) of the state integer; the returned
density matrix is indexed by r = sum_j bit(keep[j]) << j, matching the
reference's combine_states interleave (bpetsc_template_1.c:29-55).
"""

import numpy as np


def rdm_host(state, keep):
    """Compute the RDM on the host from a gathered state vector."""
    from .. import subspaces as sp

    L = state.L
    keep = np.asarray(keep, dtype=np.int64)
    amps = state.to_numpy()

    if isinstance(state.subspace, sp.Full):
        full = amps
    else:
        full = np.zeros(1 << L, dtype=np.complex128)
        dim = len(amps)
        block = 1 << 16
        for start in range(0, dim, block):
            stop = min(dim, start + block)
            states = state.subspace.idx_to_state(np.arange(start, stop))
            full[states] = amps[start:stop]

    return rdm_from_full_vector(full, keep, L)


def rdm_from_full_vector(full, keep, L):
    """rho = Tr_traced |psi><psi| for a full-space vector."""
    keep = list(map(int, keep))
    traced = [i for i in range(L) if i not in keep]
    k = len(keep)

    # tensor axis a corresponds to bit (L-1-a); put kept bits leading,
    # most-significant kept bit first
    tensor = full.reshape([2] * L)
    perm = ([L - 1 - b for b in reversed(keep)]
            + [L - 1 - b for b in reversed(traced)])
    V = np.transpose(tensor, perm).reshape(1 << k, 1 << (L - k))
    return V @ V.conj().T
