"""
Benchmark harness: per-phase wall time and peak device memory for operator
build, state init, norm, eigsolve, evolve, repeated matvec, RDM, and
conservation check, across the Hamiltonian/subspace matrix.

Equivalent of the reference's benchmarking/benchmark.py (same phases,
models, CLI shape, and ---RESULTS--- output format).

Example:
  python benchmarks/benchmark.py -L 20 -H MBL --evolve --mult --mult_count 10
"""

import argparse
from timeit import default_timer

import numpy as np

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamite_tpu import config
from dynamite_tpu.states import State
from dynamite_tpu.subspaces import Full, Parity, SpinConserve, Auto, XParity
from dynamite_tpu.tools import track_memory, get_memory_usage, mpi_print
from dynamite_tpu.computations import reduced_density_matrix
from dynamite_tpu import models


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description='Benchmarking harness for dynamite_tpu.')

    parser.add_argument('-L', type=int, required=True,
                        help='size of the spin chain')
    parser.add_argument('-H', choices=['MBL', 'long_range', 'SYK', 'ising',
                                       'XX', 'heisenberg'],
                        help='Hamiltonian to use')
    parser.add_argument('--precision', choices=['single', 'double'],
                        default='single')

    parser.add_argument('--shell', action='store_true',
                        help='accepted for reference-compatibility (all '
                             'operators are matrix-free)')
    parser.add_argument('--gpu', action='store_true',
                        help='accepted for reference-compatibility')
    parser.add_argument('--slepc_args', type=str, default='',
                        help='accepted for reference-compatibility')

    parser.add_argument('--subspace',
                        choices=['full', 'parity', 'spinconserve', 'auto',
                                 'nosortauto'],
                        default='full')
    parser.add_argument('--which_space', type=str)
    parser.add_argument('--xparity', choices=['plus', 'minus'], nargs='?',
                        const='plus')

    parser.add_argument('--evolve', action='store_true')
    parser.add_argument('-t', type=float, default=50.0)
    parser.add_argument('--no_normalize_t', action='store_true')

    parser.add_argument('--mult', action='store_true')
    parser.add_argument('--mult_count', type=int, default=1)

    parser.add_argument('--norm', action='store_true')

    parser.add_argument('--eigsolve', action='store_true')
    parser.add_argument('--nev', type=int, default=1)
    parser.add_argument('--target', type=float)

    parser.add_argument('--rdm', action='store_true')
    parser.add_argument('--keep', type=lambda s: [int(x) for x in s.split(',')])

    parser.add_argument('--check-conserves', action='store_true')

    args = parser.parse_args(argv)
    if args.evolve and not args.no_normalize_t:
        args.norm = True
    return args


def build_subspace(params, hamiltonian=None):
    space = params.which_space
    if params.subspace == 'full':
        rtn = Full()
    elif params.subspace == 'parity':
        rtn = Parity(space if space is not None else 'even')
    elif params.subspace == 'spinconserve':
        k = params.L // 2 if space is None else int(space)
        rtn = SpinConserve(params.L, k)
    elif params.subspace in ('auto', 'nosortauto'):
        if space is None:
            half = params.L // 2
            space = 'U' * half + 'D' * (params.L - half)
        rtn = Auto(hamiltonian, space, sort=params.subspace == 'auto')
    else:
        raise ValueError('invalid subspace')

    if params.xparity is not None:
        rtn = XParity(rtn, sector={'plus': '+', 'minus': '-'}[params.xparity])
    return rtn


def build_hamiltonian(params):
    builders = {
        'MBL': models.mbl,
        'long_range': models.long_range,
        'SYK': lambda L: _scaled_syk(L),
        'ising': models.ising,
        'XX': models.xx,
        'heisenberg': models.heisenberg,
    }
    rtn = builders[params.H](params.L)
    # conservation check benchmarked separately (same as the reference)
    rtn.allow_projection = True
    return rtn


def _scaled_syk(L):
    H = models.syk(L)
    H.scale(np.sqrt(6 / (L * 2) ** 3))
    return H


def log_call(function, stat_dict, alt_name=None):
    name = alt_name if alt_name is not None else function.__name__

    def wrapper(*args, **kwargs):
        mpi_print('beginning', name)
        tick = default_timer()
        result = function(*args, **kwargs)
        tock = default_timer()
        mpi_print('completed', name)
        stat_dict[name] = tock - tick
        return result

    return wrapper


def main():
    main_start = default_timer()
    params = parse_args()

    config.precision = params.precision
    config.L = params.L
    config._initialize()

    mpi_print('---ARGUMENTS---')
    for k, v in vars(params).items():
        mpi_print(f'{k},{v}')

    track_memory()
    stats = {}

    if params.H is not None:
        H = log_call(build_hamiltonian, stats)(params)
    else:
        if params.subspace == 'auto' or any(
                getattr(params, x)
                for x in ('norm', 'eigsolve', 'evolve', 'mult')):
            raise ValueError('Must specify Hamiltonian for this benchmark.')
        H = None

    subspace = log_call(build_subspace, stats)(params, H)
    if H is not None:
        H.subspace = subspace
        mpi_print('H statistics:')
        mpi_print(' dim:', H.dim[0])
        mpi_print(' nnz:', H.nnz)
        mpi_print(' density:', H.density)
        mpi_print(' nterms:', H.nterms)
        log_call(H.build_mat, stats)()

    if params.evolve or params.mult or params.rdm:
        in_state = State(L=params.L, subspace=subspace)
        out_state = State(L=params.L, subspace=subspace)
        log_call(in_state.set_random, stats, alt_name='set_random_state')()
    else:
        in_state = out_state = None

    if params.norm:
        stats['norm_value'] = log_call(
            H.infinity_norm, stats, alt_name='compute_norm')()

    if params.eigsolve:
        log_call(
            lambda: H.eigsolve(nev=params.nev, target=params.target),
            stats, alt_name='do_eigsolve')()
        from dynamite_tpu import computations
        for k, v in computations.last_solve_stats.items():
            stats[f'eigsolve_{k}'] = v

    if params.evolve:
        t = params.t
        if not params.no_normalize_t:
            t /= stats['norm_value']

        def do_evolve():
            H.evolve(in_state, t=t, result=out_state)
        log_call(do_evolve, stats)()

        # -log_view analog: per-phase breakdown and solver counters of the
        # evolve (computations.last_solve_stats)
        from dynamite_tpu import computations
        for k, v in computations.last_solve_stats.items():
            stats[f'evolve_{k}'] = v

    if params.mult:
        def do_mult():
            for _ in range(params.mult_count):
                H.dot(in_state, out_state)
            import jax
            jax.block_until_ready(out_state.data)
        log_call(do_mult, stats)()
        stats['avg_mult_time'] = stats['do_mult'] / params.mult_count
        dim = subspace.get_dimension()
        stats['nnz_per_second'] = dim * H.nnz / stats['avg_mult_time']

    if params.rdm:
        keep = params.keep if params.keep is not None \
            else list(range(params.L // 2))
        log_call(lambda: reduced_density_matrix(in_state, keep),
                 stats, alt_name='do_rdm')()

    if params.check_conserves:
        log_call(lambda: H.conserves(H.subspace), stats,
                 alt_name='do_check_conserves')()

    stats['Gb_memory'] = get_memory_usage(group_by='all', max_usage=True)
    stats['total_time'] = default_timer() - main_start

    mpi_print('---RESULTS---')
    for k, v in stats.items():
        mpi_print('{0}, {1:0.4f}'.format(k, v))


if __name__ == '__main__':
    main()
