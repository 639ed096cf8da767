"""Run the C-oracle fuzz suites in isolated child processes.

The compiled reference corrupts its allocator (and eventually the whole
host process heap) across ctypes calls; in-process these suites pass but
later unrelated XLA compiles segfault.  Each file runs in its own child
pytest with AF_C_ORACLE=1 so any corruption dies with the child.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("target", ["tests/test_queue_util.py",
                                    "tests/test_ffp_chain.py"])
def test_c_oracle_isolated(target):
    if not os.path.exists(os.path.join(_REPO, ".ref", "libaudioflux.so")):
        pytest.skip("reference oracle not built")
    env = dict(os.environ, AF_C_ORACLE="1")
    r = subprocess.run([sys.executable, "-m", "pytest", "-q", target],
                       cwd=_REPO, env=env, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:] + r.stderr[-500:])
