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

__all__ = ["scope", "trace", "annotate", "summarize_trace", "Metrics",
           "metrics"]


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


def summarize_trace(logdir: str, top: int = 25, include_host: bool = False):
    """Per-op durations from the newest profiler trace under ``logdir``.

    Returns ``[(op_name, total_us, count), ...]`` sorted by total time,
    parsed from the perfetto ``trace.json.gz`` a :func:`trace` capture
    writes.  Device-side durations are immune to the axon tunnel's
    wall-clock noise (the r5 fft4 finding: a 6-11 ms tunnel spread hid a
    1.6 ms pad/slice glue cost that one trace isolated immediately) —
    prefer this over micro-benchmark walls when attributing time inside
    a dispatch.  ``include_host`` keeps the ``$file:line``-style host
    events (dropped by default: they double-count the device work they
    wrap)."""
    import collections
    import glob
    import gzip
    import json
    paths = sorted(glob.glob(
        f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as fh:
        tr = json.load(fh)
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in tr.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") != "X":
            continue
        if not include_host and name.startswith("$"):
            continue
        durs[name] += e.get("dur", 0)
        cnt[name] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    return [(n, d, cnt[n]) for n, d in rows]


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
