"""
Utilities: multi-process printing, version info, and device-memory tracking
(reference analog: src/dynamite/tools.py, there built on MPI + PETSc memory
instrumentation; here on jax process/device APIs).
"""

import numpy as np


def mpi_print(*args, rank=0, **kwargs):
    """Print from a single host process (default process 0)."""
    import jax
    if jax.process_index() == rank:
        print(*args, **kwargs)


def complex_enabled():
    """API parity with the reference: complex arithmetic is always available
    (as stacked re/im reals on device)."""
    return True


def get_version():
    """Version information dictionary."""
    from . import __version__
    import jax
    return {
        'version': __version__,
        'jax': jax.__version__,
        'backend': jax.default_backend(),
    }


def get_version_str():
    info = get_version()
    return (f"dynamite_tpu version {info['version']} "
            f"[jax {info['jax']}, backend={info['backend']}]")


### memory tracking

_tracking = {'enabled': False, 'baseline': 0, 'peak': 0}


def track_memory():
    """Begin tracking device memory usage (call before the computation)."""
    _tracking['enabled'] = True
    _tracking['peak'] = 0
    _update_peak()
    return True


def _device_memory_bytes():
    import jax
    total = 0
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            total += stats.get('bytes_in_use', 0)
            peak = stats.get('peak_bytes_in_use')
            if peak is not None:
                _tracking['peak'] = max(_tracking['peak'], peak)
    return total


def _update_peak():
    current = _device_memory_bytes()
    _tracking['peak'] = max(_tracking['peak'], current)
    return current


def get_memory_usage(group_by='all', max_usage=False):
    """Device memory usage in GB.

    group_by : 'rank' (this process), 'node' (alias of rank), or 'all'
        (summed over processes).
    max_usage : report the peak instead of the current value.
    """
    import jax
    current = _update_peak()
    value = _tracking['peak'] if max_usage else current

    if group_by in ('rank', 'node'):
        return value / 1e9
    if group_by == 'all':
        if jax.process_count() == 1:
            return value / 1e9
        from jax.experimental import multihost_utils
        total = multihost_utils.process_allgather(
            np.array([value], dtype=np.int64))
        return float(np.sum(total)) / 1e9
    raise ValueError("group_by must be 'rank', 'node', or 'all'")


def MPI_COMM_WORLD():
    """API parity shim: a tiny object with .rank/.size mapped to jax
    process index/count."""
    import jax

    class _Comm:
        rank = jax.process_index()
        size = jax.process_count()

        def barrier(self):
            if self.size > 1:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices('barrier')

    return _Comm()
