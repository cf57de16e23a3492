import numpy as np

from dynamite_tpu import tools, config
from dynamite_tpu.ops import cvec

config._initialize()  # enables 64-bit types (the library always does)


def test_mpi_print(capsys):
    tools.mpi_print('hello', 42)
    assert capsys.readouterr().out == 'hello 42\n'


def test_version():
    info = tools.get_version()
    assert 'version' in info and 'jax' in info
    assert 'dynamite_tpu' in tools.get_version_str()


def test_memory_tracking():
    assert tools.track_memory()
    import jax.numpy as jnp
    x = jnp.zeros(1 << 16)
    x.block_until_ready()
    usage = tools.get_memory_usage(group_by='rank')
    assert usage >= 0
    assert tools.get_memory_usage(group_by='all', max_usage=True) >= usage


def test_comm_shim():
    comm = tools.MPI_COMM_WORLD()
    assert comm.rank == 0
    assert comm.size == 1
    comm.barrier()


def test_complex_enabled():
    assert tools.complex_enabled()


class TestCvec:
    def _pair(self, seed, n=256):
        rng = np.random.RandomState(seed)
        v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        return v, np.stack([v.real, v.imag])

    def test_vdot(self):
        a, ad = self._pair(0)
        b, bd = self._pair(1)
        re, im = cvec.vdot(ad, bd)
        expected = np.vdot(a, b)
        assert abs(complex(re) + 1j * complex(im) - expected) < 1e-10

    def test_norm(self):
        a, ad = self._pair(2)
        assert abs(float(cvec.norm(ad)) - np.linalg.norm(a)) < 1e-10

    def test_axpby(self):
        a, ad = self._pair(3)
        b, bd = self._pair(4)
        alpha, beta = 0.5 - 2j, 1.5 + 0.25j
        got = np.asarray(cvec.axpby(alpha.real, alpha.imag, ad,
                                    beta.real, beta.imag, bd))
        expected = alpha * a + beta * b
        assert np.allclose(got[0] + 1j * got[1], expected)

    def test_mul_elementwise(self):
        a, ad = self._pair(5)
        b, bd = self._pair(6)
        got = np.asarray(cvec.mul_elementwise(ad, bd))
        assert np.allclose(got[0] + 1j * got[1], a * b)

    def test_scale_complex(self):
        a, ad = self._pair(7)
        got = np.asarray(cvec.scale_complex(ad, 0.3, -1.2))
        assert np.allclose(got[0] + 1j * got[1], (0.3 - 1.2j) * a)


def test_spectral_site_order():
    """The relabeling is a valid permutation and does not increase the
    number of bonds crossing the low/high bit-half cut on a 2-D-ish
    graph (the sector engine's cost driver; tools.spectral_site_order)."""
    import numpy as np
    from dynamite_tpu.tools import spectral_site_order

    rng = np.random.default_rng(0)
    n = 18
    # a torus-like graph: ring + skip connections
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [(i, (i + 5) % n) for i in range(n)]
    relabel = spectral_site_order(n, edges)
    assert sorted(relabel) == list(range(n))

    def cut(es):
        half = n // 2
        return sum(1 for i, j in es if (i < half) != (j < half))

    new_edges = [(relabel[i], relabel[j]) for i, j in edges]
    assert cut(new_edges) <= cut(edges)
