"""Multi-host path: 2 real OS processes over a localhost coordinator.

Verifies SURVEY §2.10's comm-backend row end to end: each process feeds
its process-local shard via ``global_from_local`` and the 2-process
sharded result equals the single-process one bit for bit.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, %(repo)r)
from audioflux_tpu.parallel import distributed, make_mesh
from audioflux_tpu.parallel.sharded import sharded_spectrogram_fn
from audioflux_tpu.transforms.spectrogram import MelSpectrogram
import numpy as np

distributed.initialize(coordinator_address="localhost:" + port,
                       num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
mesh = make_mesh(data=2, time=4)   # spans both processes' devices
plan = MelSpectrogram(num=32, samplate=32000, radix2_exp=10,
                      slide_length=256)
fn = sharded_spectrogram_fn(plan, mesh, with_xxcc=5)

rng = np.random.default_rng(0)
full = (rng.standard_normal((4, 8192)) * 0.2).astype(np.float32)
# 'data' axis (2 shards) maps to processes; each owns 2 of 4 rows
local = full[pid * 2:(pid + 1) * 2]
x = distributed.global_from_local(local, mesh, jax.sharding.PartitionSpec(
    "data", "time"))
spec, cc = fn(x)
from jax.experimental import multihost_utils
spec_g = multihost_utils.process_allgather(spec, tiled=True)
cc_g = multihost_utils.process_allgather(cc, tiled=True)
if pid == 0:
    ref_spec = np.asarray(plan.spectrogram(full))
    ref_cc = np.asarray(plan.mfcc(ref_spec, 5))
    # cross-process compilation fuses slightly differently; tolerance is
    # float-rounding-level only
    np.testing.assert_allclose(np.asarray(spec_g), ref_spec, rtol=2e-6,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cc_g), ref_cc, rtol=2e-6,
                               atol=1e-5)
    print("MULTIHOST_OK")
"""


def test_two_process_equals_single(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))})
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # grab a free port (bind 0, close) instead of a fixed one — a stale
    # worker or a concurrent suite on a fixed port hangs the coordinator
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "MULTIHOST_OK" in outs[0], outs[0][-2000:]
