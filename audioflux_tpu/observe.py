"""Observability: profiler traces, named stages, and lightweight metrics.

SURVEY §5 commits the framework to first-class tracing/profiling on TPU.
Three pieces, all zero-cost when unused:

- ``scope(name)``: a ``jax.named_scope`` wrapper used throughout the
  transforms so XLA ops group under readable stage names in a profile
  (``af.frame``, ``af.rfft``, ``af.filterbank``, ...).
- ``trace(logdir)``: context manager around ``jax.profiler.trace`` —
  captures a TensorBoard-loadable trace of everything run inside.
- ``metrics``: a process-global registry of counters and wall-clock
  timers (``with metrics.timer("stage"): ...``); ``metrics.report()``
  returns a plain dict for logging, and ``bench.py`` can emit it as a
  stage breakdown.

The reference has no analogue (its C library is silent); this is part of
the TPU-native production story, not a port.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["scope", "trace", "annotate", "Metrics", "metrics"]


def scope(name: str):
    """Named stage scope: groups ops under ``name`` in profiler traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a ``jax.profiler`` trace of the enclosed computation.

    Writes a TensorBoard/XPlane trace under ``logdir``; view with
    ``tensorboard --logdir`` or load into Perfetto.
    """
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side trace annotation (shows on the profiler's host track)."""
    return jax.profiler.TraceAnnotation(name)


class Metrics:
    """Tiny counter/timer registry for pipeline observability."""

    def __init__(self):
        self._counters = defaultdict(float)
        self._times = defaultdict(float)
        self._calls = defaultdict(int)

    def count(self, name: str, value: float = 1.0):
        self._counters[name] += value

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._times[name] += dt
            self._calls[name] += 1

    def report(self) -> dict:
        out = {}
        for k, v in sorted(self._counters.items()):
            out[k] = v
        for k, v in sorted(self._times.items()):
            out[k + ".seconds"] = v
            out[k + ".calls"] = self._calls[k]
        return out

    def reset(self):
        self._counters.clear()
        self._times.clear()
        self._calls.clear()


metrics = Metrics()
