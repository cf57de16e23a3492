import numpy as np
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
from jax import lax
rng = np.random.default_rng(0)
n = 512
A = rng.standard_normal((n, n))
B = rng.standard_normal((n, n))
want = A @ B
for prec in (lax.Precision.DEFAULT, lax.Precision.HIGH, lax.Precision.HIGHEST):
    got = np.asarray(jax.jit(
        lambda a, b: jnp.einsum('ij,jk->ik', a, b, precision=prec)
    )(jnp.asarray(A), jnp.asarray(B)))
    err = np.abs(got - want).max() / np.abs(want).max()
    print(prec, 'rel err', err)
# elementwise f64
got = np.asarray(jax.jit(lambda a: a * a + a)(jnp.asarray(A)))
print('elementwise err', np.abs(got - (A * A + A)).max())
