"""Launch a real 2-process jax.distributed run (CPU backend, 4 virtual
devices per process) and check the multi-host contracts end to end.

Reference analog: the mpirun -n {1,3,4} integration matrix
(reference tests/integration/run_all_tests.py).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), 'multiprocess_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the worker sets its own JAX_PLATFORMS/XLA_FLAGS; scrub the conftest's
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), '2', str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multi-process workers timed out:\n'
                    + '\n'.join(outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'
        assert f'OK process {pid}' in out
