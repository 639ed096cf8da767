"""Effective-backend resolution for trace-time TPU gates.

Every TPU fast path in this package is chosen at trace time ("am I
compiling for the TPU?").  ``jax.default_backend()`` alone ignores
``jax.default_device(...)`` scopes, so a Pallas path traced inside a
``with jax.default_device(cpu)`` block on a TPU host would try to lower
a Mosaic kernel for the CPU backend and fail ("Only interpret mode is
supported on CPU backend") — bench.py's cross-backend accuracy gates do
exactly that.  All gates call :func:`effective_backend` instead.
"""

from __future__ import annotations

import contextlib
import threading

import jax

__all__ = ["effective_backend", "on_tpu", "native_fft_scope",
           "native_fft_pinned"]

_tls = threading.local()


def effective_backend() -> str:
    d = jax.config.jax_default_device
    if d is not None:
        # jax.default_device(...) accepts a Device OR a platform string
        # ("cpu"); only Device has .platform.
        return getattr(d, "platform", str(d)).lower()
    return jax.default_backend()


def on_tpu() -> bool:
    return effective_backend() == "tpu"


@contextlib.contextmanager
def native_fft_scope():
    """Trace-time scope pinning ``ops.fft`` to the native XLA FFT.

    The mesh-parallel wrappers (``parallel/sharded*.py``) build graphs
    that GSPMD partitions via sharding constraints.  XLA partitions the
    native FFT HLO along batch dims natively, but a ``pallas_call`` is
    an opaque custom call that GSPMD may replicate (all-gathering the
    operand) — so the sharded graph builders pin the native tier while
    tracing.  Single-chip callers are unaffected."""
    prev = getattr(_tls, "native_fft", False)
    _tls.native_fft = True
    try:
        yield
    finally:
        _tls.native_fft = prev


def native_fft_pinned() -> bool:
    return getattr(_tls, "native_fft", False)
