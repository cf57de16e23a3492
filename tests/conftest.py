"""
Test configuration: tests run on a virtual 8-device CPU mesh, so the
multi-chip sharding paths are exercised without TPU hardware (the driver's
dryrun validates the same thing; bench.py runs on the real chip).
"""

import os
import sys

# must be set before the jax backend initializes (note: the environment may
# pre-set JAX_PLATFORMS to a hardware plugin, so force via jax.config too)
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache makes repeated test runs much faster
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_test_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
