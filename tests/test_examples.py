"""All examples/ recipes run headless (CI mode) without error."""

import glob
import os
import subprocess
import sys

import pytest

EX_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
SCRIPTS = sorted(glob.glob(os.path.join(EX_DIR, "[0-9]*.py")))


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.basename(s) for s in SCRIPTS])
def test_example_runs(script):
    env = dict(os.environ)
    env.pop("AF_EXAMPLES_PLOT", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["AF_FORCE_CPU"] = "1"
    r = subprocess.run([sys.executable, script], cwd=EX_DIR,
                       capture_output=True, text=True, timeout=480, env=env)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
