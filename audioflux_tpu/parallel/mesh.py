"""Device mesh construction for data x time sharding.

The framework's two parallel axes (SURVEY.md §2.10):

- ``data``: batch-of-files parallelism (each chip processes whole clips)
- ``time``: sequence parallelism for one long recording, sharded by
  frame-blocks with ppermute halo exchange of the ``fft - slide`` overlap

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the mesh spans all processes' devices (ICI within a slice, DCN across hosts).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(data: int = 1, time: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'time') mesh over ``data*time`` devices."""
    if devices is None:
        devices = jax.devices()
    n = data * time
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, time)
    return Mesh(dev, axis_names=("data", "time"))
