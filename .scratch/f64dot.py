import numpy as np
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
from jax import lax
for K in (1 << 16, 1 << 19, 705432, 1 << 21):
    rng = np.random.default_rng(1)
    A = rng.standard_normal((42, K))
    B = rng.standard_normal((2, K))
    want = A @ B.T
    got = np.asarray(jax.jit(lambda a, b: lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST))(jnp.asarray(A), jnp.asarray(B)))
    err = np.abs(got - want).max() / np.abs(want).max()
    # also the reduce formulation
    got2 = np.asarray(jax.jit(lambda a, b: jnp.sum(
        a[:, None, :] * b[None, :, :], axis=-1))(jnp.asarray(A),
                                                 jnp.asarray(B)))
    err2 = np.abs(got2 - want).max() / np.abs(want).max()
    print(f'K={K}: dot_general {err:.3e}  mul+reduce {err2:.3e}')
