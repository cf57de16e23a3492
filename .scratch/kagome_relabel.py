import numpy as np
import sys
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/examples/scripts/kagome')
from lattice_library import kagome_clusters, basis_to_graph

_, edges = basis_to_graph(kagome_clusters['27a'])
n = 27
La, Lr = 13, 13  # top bit = site 26

def stats(edges, label):
    # cross bonds: one endpoint in [0, La), other in [La, n)
    cross = [(i, j) for i, j in edges
             if (i < La) != (j < La)]
    # distinct mr values (high part of the XX/YY mask, bits [La, n-1))
    mrs = set()
    for i, j in cross:
        hi = max(i, j)
        if hi < n - 1:
            mrs.add(1 << (hi - La))
    print(f'{label}: bonds={len(edges)} cross={len(cross)} '
          f'distinct_mr={len(mrs)}')

stats(edges, 'original')

# spectral bisection: order sites by the Fiedler vector
A = np.zeros((n, n))
for i, j in edges:
    A[i, j] = A[j, i] = 1
D = np.diag(A.sum(1))
L = D - A
w, V = np.linalg.eigh(L)
fiedler = V[:, 1]
order = np.argsort(fiedler)
relabel = np.empty(n, dtype=int)
relabel[order] = np.arange(n)
e2 = [(int(relabel[i]), int(relabel[j])) for i, j in edges]
stats(e2, 'fiedler')

# also recursively bisect each half for good measure (sort within halves
# by the half-subgraph fiedler vector)
def recursive_order(nodes, edges_set, depth=0):
    if len(nodes) <= 2 or depth > 6:
        return list(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    A = np.zeros((m, m))
    for i, j in edges_set:
        if i in idx and j in idx:
            A[idx[i], idx[j]] = A[idx[j], idx[i]] = 1
    Lm = np.diag(A.sum(1)) - A
    w, V = np.linalg.eigh(Lm)
    f = V[:, 1] if m > 1 else np.zeros(m)
    srt = [nodes[i] for i in np.argsort(f)]
    half = m // 2
    return (recursive_order(srt[:half], edges_set, depth + 1)
            + recursive_order(srt[half:], edges_set, depth + 1))

nodes = recursive_order(list(range(n)), set(map(tuple, edges)))
relabel[np.array(nodes)] = np.arange(n)
e3 = [(int(relabel[i]), int(relabel[j])) for i, j in edges]
stats(e3, 'recursive')
