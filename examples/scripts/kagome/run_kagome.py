"""
Ground state of the kagome-lattice Heisenberg antiferromagnet on a torus,
in the half-filling SpinConserve sector with an optional XParity (Z2)
symmetry layer — the spin-liquid workhorse computation.

TPU-native port of the reference study (reference:
examples/scripts/kagome/run_kagome.py).

Usage: python run_kagome.py 12
"""

from argparse import ArgumentParser
from datetime import datetime

from dynamite_tpu.operators import sigmax, sigmay, sigmaz, op_sum
from dynamite_tpu.subspaces import SpinConserve, XParity
from dynamite_tpu.tools import mpi_print

from lattice_library import kagome_clusters, basis_to_graph


def heisenberg(i, j):
    """Heisenberg interaction between sites i and j (0.25: Pauli -> spin)."""
    return op_sum(0.25 * s(i) * s(j) for s in (sigmax, sigmay, sigmaz))


def build_hamiltonian(cluster_name):
    _, edges = basis_to_graph(kagome_clusters[cluster_name])
    return op_sum(heisenberg(i, j) for i, j in edges)


def main():
    args = parse_args()

    mpi_print('Heisenberg interaction on the Kagome lattice')
    mpi_print(f'Cluster: {args.cluster}')

    H = build_hamiltonian(args.cluster)
    N = H.get_length()

    subspace = SpinConserve(N, N // 2)

    sector = None
    if not args.no_z2 and N % 2 == 0:
        # the sector containing the ground state depends on N % 4
        sector = +1 if N % 4 == 0 else -1

    if sector is None:
        mpi_print('Not applying XParity (Z2) subspace')
    else:
        mpi_print(f'XParity (Z2) symmetry sector: {sector:+d}')
        subspace = XParity(subspace, sector=sector)
    mpi_print()

    H.subspace = subspace

    tick = datetime.now()
    gs_energy, e1_energy = H.eigsolve(nev=2)[:2]
    tock = datetime.now()

    mpi_print(f'Ground state energy E: {gs_energy}')
    mpi_print(f'E/N: {gs_energy / N}')
    mpi_print()
    gap = e1_energy - gs_energy
    mpi_print(f'Gap: {gap}')
    mpi_print(f'Gap/N: {gap / N}')
    mpi_print()
    mpi_print(f'Solve completed in {tock - tick}')


def parse_args():
    parser = ArgumentParser(
        description='Solve for the ground state energy of the Heisenberg '
                    'model on the Kagome lattice.')
    parser.add_argument('cluster', default='12', nargs='?',
                        help='which Kagome cluster to use '
                             '(see lattice_library.py)')
    parser.add_argument('--no-z2', action='store_true',
                        help='do not apply XParity subspace')
    return parser.parse_args()


if __name__ == '__main__':
    main()
