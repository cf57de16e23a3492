import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from dynamite_tpu import config
from dynamite_tpu.models import syk
from dynamite_tpu.subspaces import Parity
from dynamite_tpu.ops.pallas_apply import _effective_sign_mask
from dynamite_tpu.ops.xor_dense import _typed_channels_at

config.precision = 'single'
config.L = 20
config._initialize()
H = syk(20)
sub = Parity('even', L=20)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
plan = kernel.plan
nbits = plan.dim_right.bit_length() - 1
print('nbits', nbits, 'groups', len(plan.groups), 'terms', plan.nterms)
eff = [[_effective_sign_mask(int(s), int(m), sub, sub) for s in signs]
       for m, pm, signs, coeffs in plan.groups]
for La in (8, 9, 10, 11):
    C = len(_typed_channels_at(plan.groups, eff, La))
    na = 1 << La
    print(f'La={La} C={C} tableGB={C*na*na*4/1e9:.2f}')
