"""Batch runner: files -> native loader -> sharded device pipeline.

BASELINE config 5 shape: a batch of audio files is decoded host-side by the
native C++ loader (multithreaded), placed onto the mesh with the batch
sharded over the 'data' axis and samples over 'time', and pushed through a
sharded spectrogram pipeline. Multi-host: initialize ``jax.distributed``
first; each process feeds its addressable shard.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioflux_tpu.parallel.sharded import sharded_spectrogram_fn

__all__ = ["BatchRunner"]


class BatchRunner:
    """Run a spectrogram plan over batches of files on a device mesh."""

    def __init__(self, plan, mesh: Mesh, clip_length: int,
                 with_xxcc: int = 0, loader_threads: int = 4):
        time_shards = mesh.shape["time"]
        if clip_length % (time_shards * plan.slide_length) != 0:
            raise ValueError(
                "clip_length must be divisible by time_shards * slide")
        self.plan = plan
        self.mesh = mesh
        self.clip_length = clip_length
        self.loader_threads = loader_threads
        self._fn = sharded_spectrogram_fn(plan, mesh, with_xxcc=with_xxcc)
        self._in_sharding = NamedSharding(mesh, P("data", "time"))

    def run_files(self, paths):
        """Decode + process a list of WAV paths; batch must divide the
        'data' axis size."""
        from audioflux_tpu.io import native
        batch, good = native.load_batch(paths, self.clip_length,
                                        self.loader_threads)
        return self.run_array(batch), good

    def run_array(self, batch: np.ndarray):
        """(B, clip_length) float32 -> sharded pipeline output."""
        x = jax.device_put(jnp.asarray(batch, jnp.float32),
                           self._in_sharding)
        return self._fn(x)
