"""Run the 'isolated'-marked SPMD tests in a FRESH subprocess.

The big 8-device engine executables crash XLA:CPU's native code when
handled inside a LONG-LIVED pytest process: round 5 caught four
tier-killing faulthandler dumps across four --full runs — two in
``executable.serialize`` (persistent-cache write), one in cache
``deserialize`` (load), and, after disabling the compile cache for
those tests entirely, one inside plain ``pxla compile`` — always at
the slow SPMD tests ~150 tests into the run, never in a fresh solo
process, where the identical programs compile, serialize, and load
cleanly (and did so again immediately after each crash). Process age,
not the cache, is the trigger, so the fix is process isolation:
``conftest.pytest_collection_modifyitems`` skips ``isolated`` tests
in the main process and this wrapper re-runs them in one fresh
``pytest --isolated-in-proc`` subprocess with the (process-fresh-safe,
host-fingerprinted) compile cache enabled.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TARGETS = [
    "tests/test_spmd.py",
    "tests/test_spmd_production.py",
    "tests/test_predictor_config.py::test_checkpoint_resume_under_spmd",
]


@pytest.mark.slow
def test_isolated_spmd_suite_in_subprocess():
    cmd = [sys.executable, "-X", "faulthandler", "-m", "pytest",
           *TARGETS, "-q", "--full", "--isolated-in-proc",
           "-p", "no:cacheprovider"]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True,
                          text=True, timeout=2400)
    tail = "\n".join((proc.stdout + "\n" + proc.stderr).splitlines()[-60:])
    assert proc.returncode == 0, (
        f"isolated SPMD subprocess failed (rc={proc.returncode}):\n{tail}")
    # the subprocess must have actually run the monster tests, not
    # collected zero (e.g. after a rename of a TARGETS entry)
    assert " passed" in proc.stdout and "no tests ran" not in proc.stdout
