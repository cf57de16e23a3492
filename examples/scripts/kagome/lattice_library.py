"""
Kagome lattice clusters on a torus.

Cluster basis vectors follow Table 1 of Lauchli et al. 2011
[doi:10.1103/PhysRevB.83.212401] ('48' from Lauchli et al. 2019
[doi:10.1103/PhysRevB.100.155142]): each pair spans the periodic tile in
units of the (length-2) kagome unit cell.

Sites live on the triangular lattice with one sublattice removed: integer
points (x, y) with x even or y odd. Torus equivalence is resolved with the
adjugate of the basis matrix (an exact integer canonical form), rather than
geometric point-in-parallelogram tests.
"""

from collections import defaultdict

import numpy as np

kagome_clusters = {
    '12':  [(2, 0), (0, 2)],
    '15':  [(2, -1), (-1, 3)],
    '18a': [(2, -1), (0, 3)],
    '18b': [(2, -2), (-2, -1)],
    '21':  [(2, 1), (-1, 3)],
    '24':  [(1, 2), (-3, 2)],
    '27a': [(2, 1), (-3, 3)],
    '27b': [(3, 0), (0, 3)],
    '30':  [(2, 1), (-2, 4)],
    '33':  [(1, 2), (4, -3)],
    '36a': [(-2, 3), (4, 0)],
    '36b': [(3, 0), (-3, 4)],
    '36c': [(3, 0), (-1, 4)],
    '36d': [(4, -2), (-2, 4)],
    '39a': [(-1, 3), (5, -2)],
    '39b': [(1, 3), (-3, 4)],
    '42a': [(-1, 3), (5, -1)],
    '42b': [(-2, 4), (4, -1)],
    '48':  [(4, 0), (0, 4)],
}

# the six triangular-lattice neighbor directions
_NEIGHBOR_DELTAS = ((0, 1), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1))


def _is_site(x, y):
    """Kagome = triangular lattice minus the (x odd, y even) sublattice."""
    return x % 2 == 0 or y % 2 == 1


def basis_to_graph(basis, start_vertex=None):
    """Enumerate the kagome sites of one torus tile and their
    nearest-neighbor edges.

    Returns (coords, edges): real-space coordinates per vertex and a set of
    (i, j) index pairs with i < j.
    """
    # translation vectors are twice the unit-cell basis
    t1 = (2 * basis[0][0], 2 * basis[0][1])
    t2 = (2 * basis[1][0], 2 * basis[1][1])
    det = t1[0] * t2[1] - t1[1] * t2[0]
    if det == 0:
        raise ValueError('basis vectors are linearly dependent')
    D = abs(det)
    sgn = 1 if det > 0 else -1

    def canon(x, y):
        """Exact integer label, invariant under torus translations:
        adj(T) @ p mod |det T|."""
        u = sgn * (t2[1] * x - t2[0] * y) % D
        v = sgn * (-t1[1] * x + t1[0] * y) % D
        return (u, v)

    # sweep a box guaranteed to cover one tile
    reach = 2 * (abs(t1[0]) + abs(t1[1]) + abs(t2[0]) + abs(t2[1]))
    label_to_idx = {}
    points = []
    if start_vertex is not None:
        if not _is_site(*start_vertex):
            raise ValueError('start point does not correspond to a vertex')
        label_to_idx[canon(*start_vertex)] = 0
        points.append(tuple(start_vertex))
    for x in range(-reach, reach + 1):
        for y in range(-reach, reach + 1):
            if not _is_site(x, y):
                continue
            lab = canon(x, y)
            if lab not in label_to_idx:
                label_to_idx[lab] = len(points)
                points.append((x, y))

    edges = set()
    for i, (x, y) in enumerate(points):
        for dx, dy in _NEIGHBOR_DELTAS:
            nx, ny = x + dx, y + dy
            if not _is_site(nx, ny):
                continue
            j = label_to_idx[canon(nx, ny)]
            if i != j:
                edges.add((min(i, j), max(i, j)))

    coords = [(x + y / 2, np.sqrt(3) * y / 2) for x, y in points]
    return coords, edges


def _self_test():
    """Each cluster has the advertised number of sites, and every site has
    degree exactly 4."""
    for name, basis in kagome_clusters.items():
        n_expected = int(name[:2])
        coords, edges = basis_to_graph(basis)
        assert len(coords) == n_expected, \
            f'{name}: {len(coords)} sites, expected {n_expected}'
        degree = defaultdict(int)
        for i, j in edges:
            degree[i] += 1
            degree[j] += 1
        for v in range(n_expected):
            assert degree[v] == 4, f'{name}: vertex {v} has degree {degree[v]}'
    print('all clusters OK')


if __name__ == '__main__':
    _self_test()
