"""Smoke coverage for every CLI entry point in scripts/.

The reference's drivers are its de-facto public API (My_test*.py,
MyTrain*.py, iouTracke_*.py ... SURVEY §2.6-§2.8); ours are the scripts/
mirrors.  Their library internals are covered elsewhere — what is NOT
covered elsewhere is the script surface itself: module import (a stray
module-level device touch would hang on a wedged accelerator tunnel — the
exact bug fixed in fdt/geometry/matching.py) and the argparse wiring.
`--help` exercises both in a child process with a hard timeout, so a hang
fails the test instead of the suite.
"""
import glob
import os
import subprocess
import sys

import pytest

_SCRIPTS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "scripts", "*.py")))


@pytest.mark.parametrize("script", _SCRIPTS,
                         ids=[os.path.basename(s) for s in _SCRIPTS])
def test_cli_help(script):
    r = subprocess.run([sys.executable, script, "--help"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (script, r.stderr[-2000:])
    assert "usage" in r.stdout.lower(), (script, r.stdout[:500])
