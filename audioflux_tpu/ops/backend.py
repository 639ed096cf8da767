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

import jax

__all__ = ["effective_backend", "on_tpu"]


def effective_backend() -> str:
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform
    return jax.default_backend()


def on_tpu() -> bool:
    return effective_backend() == "tpu"
