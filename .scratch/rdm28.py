import time
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import sys; sys.path.insert(0, '/root/repo')
from dynamite_tpu import config
config.precision = 'single'
config.L = 28
config._initialize()
from dynamite_tpu.subspaces import SpinConserve
from dynamite_tpu.states import State
from dynamite_tpu.computations import entanglement_entropy
sub = SpinConserve(28, 14)
print('dim', sub.get_dimension())
psi = State(state='random', subspace=sub, seed=1)
t0 = time.perf_counter()
S = entanglement_entropy(psi, keep=range(14))
print(f'half-chain entropy {S:.6f} in {time.perf_counter()-t0:.1f}s')
# a random state's entanglement ~ ln(dim_A) - 1/2 (Page value)
import math
print('Page-ish expectation ~', math.log(math.comb(14, 7)) * 0.9)
