"""Test config: force CPU platform with 8 virtual devices for sharding tests.

Must run before any JAX backend initialization. The axon TPU plugin ignores
the JAX_PLATFORMS env var, so we set the config flag programmatically.
"""

import os
import subprocess

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

# The full suite compiles ~300 XLA executables in one process; each adds
# dozens of mmaps and the default vm.max_map_count (65530) is exhausted
# around test ~250, after which the next mmap fails and XLA segfaults in
# backend_compile. Raise the limit (best-effort; needs root).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1048576:
            subprocess.run(["sysctl", "-w", "vm.max_map_count=1048576"],
                           capture_output=True, timeout=10)
except Exception:
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make the isolated-skip story self-evident in the default output.

    The C-oracle fuzz rigs (test_queue_util / test_ffp_chain) are skipped
    in-process and re-run inside child pytests by test_c_oracle.py, because
    the reference .so corrupts the host heap.  A plain ``pytest -q`` reader
    should not mistake that safety re-route for dropped coverage.
    """
    skipped = terminalreporter.stats.get("skipped", [])
    n_iso = sum(1 for rep in skipped
                if "runs isolated via test_c_oracle.py" in str(
                    getattr(rep, "longrepr", "")))
    if not n_iso:
        return
    passed = {rep.nodeid.split("::")[-1]
              for rep in terminalreporter.stats.get("passed", [])
              if "test_c_oracle" in rep.nodeid}
    if passed:
        terminalreporter.write_line(
            f"note: {n_iso} C-oracle fuzz tests skipped here were re-run "
            f"isolated by test_c_oracle.py ({len(passed)} child pytests): "
            "PASSED")
    else:
        terminalreporter.write_line(
            f"note: {n_iso} C-oracle fuzz tests are skipped in-process and "
            "run isolated via test_c_oracle.py (not in this selection)")


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name}.npz not generated")
        return np.load(path)
    return load


@pytest.fixture(scope="session")
def signals():
    sr = 32000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    sine = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    k = 8000.0 / 20.0
    chirp = (0.5 * np.cos(2 * np.pi * 20 * (np.power(k, t) - 1) / np.log(k))
             ).astype(np.float32)
    short = sine[:4096].copy()
    chord = (0.3 * np.sin(2 * np.pi * 261.63 * t)
             + 0.3 * np.sin(2 * np.pi * 392.0 * t)).astype(np.float32)
    return {"sine": sine, "chirp": chirp, "short": short, "chord": chord}


def assert_close_to_golden(ours, ref, rtol_of_peak=5e-5, name=""):
    """Max abs error relative to the golden's peak magnitude."""
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    assert ours.shape == ref.shape, f"{name}: shape {ours.shape} != {ref.shape}"
    peak = np.abs(ref).max()
    err = np.abs(ours - ref).max()
    assert err <= rtol_of_peak * max(peak, 1e-20), (
        f"{name}: max|err|={err:.3e} peak={peak:.3e} "
        f"(rel {err / max(peak, 1e-20):.3e} > {rtol_of_peak})")
