"""FFT entry points with a matmul-DFT fallback for small transforms.

The axon TPU backend's native FFT custom-call is unimplemented below a
certain transform length (empirically: 512-point fails, 2048/4096 work),
surfacing as ``UNIMPLEMENTED: TPU backend error`` at the next fence.  At
those small sizes a dense DFT-as-matmul is fast on the MXU anyway (and is
what the fused Pallas kernels do at every size), so every transform in
this package calls these wrappers instead of ``jnp.fft`` directly:
lengths below ``_MIN_NATIVE`` on a TPU backend run as (HIGHEST-precision)
matmuls, everything else uses the native FFT.

CPU/interpret paths are unchanged (always native ``jnp.fft``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft", "irfft", "fft", "ifft"]

_MIN_NATIVE = 2048  # smallest length the axon TPU FFT handles
_HI = jax.lax.Precision.HIGHEST


def _use_matmul(n: int) -> bool:
    from audioflux_tpu.ops.backend import on_tpu
    return n < _MIN_NATIVE and on_tpu()


# The caches hold NUMPY arrays, never jnp arrays: a jnp constant built
# during one jit trace is a Tracer, and caching it leaks it into every
# later trace (UnexpectedTracerError on the second jit that hits the
# same length — found by an on-chip profiling harness in r4).  numpy
# constants fold into each trace independently.

@functools.lru_cache(maxsize=None)
def _rfft_mats(n: int):
    k = np.arange(n // 2 + 1)
    ang = -2.0 * np.pi * np.outer(np.arange(n), k) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _irfft_mats(n: int):
    m = n // 2 + 1
    k = np.arange(m)
    ang = 2.0 * np.pi * np.outer(k, np.arange(n)) / n
    w = np.ones((m, 1)); w[1:] = 2.0
    if n % 2 == 0:
        w[-1] = 1.0
    cr = np.cos(ang) * w / n
    ci = -np.sin(ang) * w / n  # applied to Im(X)
    return cr.astype(np.float32), ci.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _fft_mats(n: int):
    ang = -2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _along_last(x, axis, f):
    if axis in (-1, x.ndim - 1):
        return f(x)
    x = jnp.moveaxis(x, axis, -1)
    return jnp.moveaxis(f(x), -1, axis)


def _pad_or_trim(x, n):
    ln = x.shape[-1]
    if n is None or n == ln:
        return x
    if n < ln:
        return x[..., :n]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n - ln)]
    return jnp.pad(x, pad)


def rfft(x, n=None, axis=-1):
    ln = n if n is not None else x.shape[axis]
    if not _use_matmul(ln):
        return jnp.fft.rfft(x, n=n, axis=axis)

    def f(v):
        v = _pad_or_trim(v, ln).astype(jnp.float32)
        cr, ci = _rfft_mats(ln)
        re = jnp.matmul(v, cr, precision=_HI)
        im = jnp.matmul(v, ci, precision=_HI)
        return jax.lax.complex(re, im)

    return _along_last(x, axis, f)


def irfft(x, n=None, axis=-1):
    ln = n if n is not None else 2 * (x.shape[axis] - 1)
    if not _use_matmul(ln):
        return jnp.fft.irfft(x, n=n, axis=axis)

    def f(v):
        v = _pad_or_trim(v, ln // 2 + 1)
        cr, ci = _irfft_mats(ln)
        return (jnp.matmul(jnp.real(v), cr, precision=_HI)
                + jnp.matmul(jnp.imag(v), ci, precision=_HI))

    return _along_last(x, axis, f)


def fft(x, n=None, axis=-1):
    ln = n if n is not None else x.shape[axis]
    if not _use_matmul(ln):
        return jnp.fft.fft(x, n=n, axis=axis)

    def f(v):
        v = _pad_or_trim(v, ln)
        cr, ci = _fft_mats(ln)
        vr = jnp.real(v).astype(jnp.float32)
        vi = jnp.imag(v).astype(jnp.float32)
        re = (jnp.matmul(vr, cr, precision=_HI)
              - jnp.matmul(vi, ci, precision=_HI))
        im = (jnp.matmul(vr, ci, precision=_HI)
              + jnp.matmul(vi, cr, precision=_HI))
        return jax.lax.complex(re, im)

    return _along_last(x, axis, f)


def ifft(x, n=None, axis=-1):
    ln = n if n is not None else x.shape[axis]
    if not _use_matmul(ln):
        return jnp.fft.ifft(x, n=n, axis=axis)
    # conj trick: ifft(x) = conj(fft(conj(x))) / n
    y = fft(jnp.conj(_pad_or_trim(jnp.moveaxis(x, axis, -1), ln)))
    y = jnp.conj(y) / ln
    return jnp.moveaxis(y, -1, axis)
