"""Batch runner: files -> native loader -> sharded device pipeline.

BASELINE config 5 shape: a batch of audio files is decoded host-side by the
native C++ loader (multithreaded), placed onto the mesh with the batch
sharded over the 'data' axis and samples over 'time', and pushed through a
sharded spectrogram pipeline.

Multi-host: after ``parallel.distributed.initialize()`` each process feeds
its addressable shard (``global_from_local``); single-process behavior is
unchanged.

Long jobs checkpoint/restart (SURVEY §5): ``run_files_resumable`` keeps an
append-only manifest of completed files next to the saved outputs, fsyncs
it after every chunk, and skips already-done work on restart — kill the
process at any point and a rerun completes each file exactly once.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioflux_tpu.parallel.sharded import sharded_spectrogram_fn
from audioflux_tpu.parallel.distributed import global_from_local
from audioflux_tpu.observe import metrics

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
        self._spec = P("data", "time")

    def run_files(self, paths):
        """Decode + process a list of WAV paths; batch must divide the
        'data' axis size."""
        from audioflux_tpu.io import native
        with metrics.timer("af.load_batch"):
            batch, good = native.load_batch(paths, self.clip_length,
                                            self.loader_threads)
        return self.run_array(batch), good

    def run_array(self, batch: np.ndarray):
        """(B, clip_length) float32 -> sharded pipeline output.

        Under multi-host, ``batch`` is this process's local block of the
        global batch (rows this process owns along 'data').
        """
        with metrics.timer("af.run_array"):
            x = global_from_local(np.asarray(batch, np.float32),
                                  self.mesh, self._spec)
            out = self._fn(x)
            metrics.count("af.clips", batch.shape[0])
            return out

    # ------------------------------------------------------------------
    def run_files_resumable(self, paths, out_dir: str,
                            chunk_size: int | None = None,
                            max_chunks: int | None = None):
        """Process ``paths`` in chunks, saving .npy results + a manifest.

        The manifest (``manifest.jsonl`` in ``out_dir``) records each
        completed file; restarting with the same arguments skips entries
        already present, so every file is processed exactly once across
        any number of kills/restarts.  Returns (n_done_this_run,
        n_skipped).  ``max_chunks`` bounds work per call (used by tests
        to simulate a mid-job kill).
        """
        from audioflux_tpu.io import native

        os.makedirs(out_dir, exist_ok=True)
        manifest = os.path.join(out_dir, "manifest.jsonl")
        done = set()
        if os.path.exists(manifest):
            with open(manifest) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        done.add(json.loads(line)["path"])
        todo = [p for p in paths if p not in done]
        if chunk_size is None:
            chunk_size = max(1, int(self.mesh.shape["data"]))
        n_new = 0
        chunks = 0
        for i in range(0, len(todo), chunk_size):
            if max_chunks is not None and chunks >= max_chunks:
                break
            chunk = todo[i:i + chunk_size]
            pad = chunk + [chunk[-1]] * (chunk_size - len(chunk))
            batch, _ = native.load_batch(pad, self.clip_length,
                                         self.loader_threads)
            out = self.run_array(batch)
            spec = out[0] if isinstance(out, tuple) else out
            spec = np.asarray(spec)
            with open(manifest, "a") as f:
                for j, p in enumerate(chunk):
                    base = os.path.splitext(os.path.basename(p))[0]
                    np.save(os.path.join(out_dir, base + ".npy"), spec[j])
                    f.write(json.dumps({"path": p}) + "\n")
                f.flush()
                os.fsync(f.fileno())
            n_new += len(chunk)
            chunks += 1
        return n_new, len(paths) - len(todo)
