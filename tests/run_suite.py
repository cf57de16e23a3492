"""
Full-suite runner with per-file process isolation.

The XLA CPU client intermittently dies with `Fatal Python error: Aborted`
partway through a long single-process pytest run (seen twice in round 4,
at different tests, never reproducible in isolation). Until that is
root-caused upstream, this runner executes each test FILE in its own
pytest subprocess so one aborted client costs one file — an isolation
pattern the reference also uses for its MPI matrix
(tests/integration/run_all_tests.py:101-141).

Usage:  python tests/run_suite.py [extra pytest args]
Exit status 0 iff every file passed.
"""

import glob
import os
import subprocess
import sys
import time


def main():
    root = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(root)
    files = sorted(glob.glob(os.path.join(root, 'unit', 'test_*.py'))) + \
        sorted(glob.glob(os.path.join(root, 'integration', 'test_*.py')))
    extra = sys.argv[1:]
    failures = []
    t_start = time.time()
    for f in files:
        rel = os.path.relpath(f, repo)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, '-m', 'pytest', rel, '-q'] + extra,
            cwd=repo)
        status = 'ok' if proc.returncode == 0 else \
            f'FAILED (rc={proc.returncode})'
        print(f'--- {rel}: {status} ({time.time() - t0:.1f}s)', flush=True)
        if proc.returncode != 0:
            failures.append(rel)
    print(f'=== {len(files) - len(failures)}/{len(files)} files passed '
          f'in {time.time() - t_start:.0f}s')
    if failures:
        print('failed files:', *failures, sep='\n  ')
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
