"""Multi-host execution: ``jax.distributed`` init + process-local feeding.

SURVEY §2.10 comm-backend row: across hosts the mesh spans every process's
devices (ICI within a slice, DCN/gloo between processes) and each process
contributes only its *addressable* shard of the global batch.  The two
pieces a multi-host batch job needs:

- ``initialize(...)``: wraps ``jax.distributed.initialize`` with a
  barrier-on-init (SURVEY §5) so no process races ahead before the
  coordination service has everyone.
- ``global_from_local(local, mesh, spec)``: builds a global jax.Array
  from each process's local ndarray via
  ``jax.make_array_from_process_local_data`` — the multi-host form of
  ``jax.device_put(x, NamedSharding(...))``.

Single-process behavior is identical to the plain path (the helpers
degrade to device_put), so every sharded pipeline in this package works
unchanged under 1..N processes.  Verified by
``tests/test_multihost.py``, which launches two real OS processes over a
localhost coordinator with gloo CPU collectives and asserts bit-equality
with the single-process result.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "is_initialized", "global_from_local",
           "process_barrier"]

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None):
    """Start the JAX distributed runtime and barrier until all arrive.

    On TPU pods the three arguments are auto-detected from the
    environment; pass them explicitly for CPU/localhost testing.
    No-op if already initialized.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    process_barrier("af_init")


def is_initialized() -> bool:
    return _initialized or jax.process_count() > 1


def process_barrier(name: str = "af_barrier", timeout_s: int = 120):
    """Block until every process reaches this point."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def global_from_local(local: np.ndarray, mesh: Mesh, spec: P):
    """Assemble a global array from this process's local shard.

    ``local`` is the block of the global array this process owns along
    the sharded axes (all processes must pass consistent shapes).  In a
    single-process mesh this is just ``jax.device_put``.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() <= 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)
