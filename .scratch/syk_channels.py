import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from dynamite_tpu import config
from dynamite_tpu.models import syk
from dynamite_tpu.subspaces import Parity
from dynamite_tpu.ops.pallas_apply import _effective_sign_mask
from dynamite_tpu.utils.bitwise import parity

config.precision = 'single'
config.L = 16
config._initialize()
H = syk(16)
sub = Parity('even', L=16)
H.add_subspace(sub)
kernel = H.get_mat(subspaces=(sub, sub))
plan = kernel.plan
nbits = plan.dim_right.bit_length() - 1
print('groups', len(plan.groups), 'terms', plan.nterms, 'dim', plan.dim_right)

eff = []
for m, pm, signs, coeffs in plan.groups:
    eff.append([_effective_sign_mask(int(s), int(m), sub, sub)
                for s in signs])

for La in (8, 9, 10, 11, 12):
    na = 1 << La
    amask = na - 1
    # classify channels by the coefficient type of their terms
    ch = {}
    for gi, (m, pm, signs, coeffs) in enumerate(plan.groups):
        pm = int(pm); mh = pm >> La
        for (s_eff, _cs), c in zip(eff[gi], coeffs):
            sh = s_eff >> La
            k = (mh, sh)
            has_r = abs(c.real) > 0
            has_i = abs(c.imag) > 0
            r0, i0 = ch.get(k, (False, False))
            ch[k] = (r0 or has_r, i0 or has_i)
    n_real = sum(1 for r, i in ch.values() if r and not i)
    n_imag = sum(1 for r, i in ch.values() if i and not r)
    n_mix = sum(1 for r, i in ch.values() if r and i)
    C = len(ch)
    nh = 1 << (nbits - La)
    # table bytes: old scheme = 2 tables everywhere if any imag; new = 1
    # per pure channel, 2 per mixed
    old = C * 2 * na * na * 4
    new = (n_real + n_imag + 2 * n_mix) * na * na * 4
    print(f'La={La} C={C} real={n_real} imag={n_imag} mixed={n_mix} '
          f'old_MB={old/1e6:.0f} new_MB={new/1e6:.0f}')
