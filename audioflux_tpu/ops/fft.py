"""FFT entry points with a matmul-DFT fallback for small transforms.

The axon TPU backend's native FFT custom-call is unimplemented below a
certain transform length (empirically: 512-point fails, 2048/4096 work),
surfacing as ``UNIMPLEMENTED: TPU backend error`` at the next fence.  At
those small sizes a dense DFT-as-matmul is fast on the MXU anyway (and is
what the fused Pallas kernels do at every size), so every transform in
this package calls these wrappers instead of ``jnp.fft`` directly.

Three tiers on a TPU backend (r4):
* n < 2048: dense DFT matmul (HIGHEST precision, exact-class);
* 2048 <= n <= 32768 (pow2): the four-step Pallas kernel
  (``ops/pallas_fft``, bf16x3 ~1e-5 class, measured ~2.5x the native
  custom-call net of dispatch overhead) plus one bin-order relayout per
  direction — hot paths that can stay in the kernel's T-layout (YIN,
  HPSS, reassign, ISTFT) bypass these wrappers and skip the relayout;
* everything else: the native XLA FFT.

``exact=True`` skips the four-step tier (keeps matmul-DFT/native):
log-magnitude cepstral consumers (PitchCEP, Cepstrogram) amplify the
kernel's ~1e-5 error on near-zero bins through log() into argmax flips
(measured: 8.5%% of CEP frames flipped by >100 Hz on a clean tone), so
they pin the exact path.

CPU/interpret paths are unchanged (always native ``jnp.fft``), so golden
fixtures are unaffected.
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


def _use_fourstep(n: int) -> bool:
    """Mid sizes ride the four-step Pallas kernel (ops/pallas_fft) —
    measured ~2.5x the native XLA fft custom-call net of dispatch
    overhead at the library's batched shapes.  Generic natural-order
    entry points pay one layout relayout per direction; hot paths that
    can stay in the kernel's T-layout (YIN, HPSS, reassign, istft)
    call the kernel directly instead.  ``backend.native_fft_scope``
    (the sharded graph builders) pins the native tier — GSPMD
    partitions the FFT HLO but may replicate an opaque pallas_call."""
    from audioflux_tpu.ops.backend import native_fft_pinned, on_tpu
    if native_fft_pinned():
        return False
    from audioflux_tpu.ops import pallas_fft as pfft
    return pfft.supports(n)


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


def rfft(x, n=None, axis=-1, exact=False):
    ln = n if n is not None else x.shape[axis]
    if _use_matmul(ln):
        def f(v):
            v = _pad_or_trim(v, ln).astype(jnp.float32)
            cr, ci = _rfft_mats(ln)
            re = jnp.matmul(v, cr, precision=_HI)
            im = jnp.matmul(v, ci, precision=_HI)
            return jax.lax.complex(re, im)
        return _along_last(x, axis, f)
    if _use_fourstep(ln) and not exact:
        from audioflux_tpu.ops import pallas_fft as pfft

        def f(v):
            v = _pad_or_trim(v, ln).astype(jnp.float32)
            yr, yi = pfft.fft4_fwd(v)
            m = ln // 2 + 1
            return jax.lax.complex(pfft.t_to_natural(yr)[..., :m],
                                   pfft.t_to_natural(yi)[..., :m])
        return _along_last(x, axis, f)
    return jnp.fft.rfft(x, n=n, axis=axis)


def irfft(x, n=None, axis=-1, exact=False):
    ln = n if n is not None else 2 * (x.shape[axis] - 1)
    if _use_matmul(ln):
        def f(v):
            v = _pad_or_trim(v, ln // 2 + 1)
            cr, ci = _irfft_mats(ln)
            return (jnp.matmul(jnp.real(v), cr, precision=_HI)
                    + jnp.matmul(jnp.imag(v), ci, precision=_HI))
        return _along_last(x, axis, f)
    if _use_fourstep(ln) and not exact:
        from audioflux_tpu.ops import pallas_fft as pfft

        def f(v):
            v = _pad_or_trim(v, ln // 2 + 1)
            # hermitian extension, then the inverse kernel; forcing the
            # DC/Nyquist imaginary parts to zero mirrors jnp.fft.irfft's
            # convention on hermitian-inconsistent input
            edge = (jnp.zeros(ln // 2 + 1, bool)
                    .at[0].set(True).at[-1].set(True))
            v = jnp.where(edge, jnp.real(v).astype(v.dtype), v)
            zh = jnp.conj(v)[..., 1:ln // 2]
            zfull = jnp.concatenate([v, jnp.flip(zh, axis=-1)], axis=-1)
            n1 = ln // 128
            yr = pfft.natural_to_t(jnp.real(zfull), n1)
            yi = pfft.natural_to_t(jnp.imag(zfull), n1)
            out, _ = pfft.fft4_inv(yr, yi, out_imag=False)
            return out
        return _along_last(x, axis, f)
    return jnp.fft.irfft(x, n=n, axis=axis)


def fft(x, n=None, axis=-1, exact=False):
    ln = n if n is not None else x.shape[axis]
    if _use_matmul(ln):
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
    if _use_fourstep(ln) and not exact:
        from audioflux_tpu.ops import pallas_fft as pfft

        def f(v):
            v = _pad_or_trim(v, ln)
            if jnp.iscomplexobj(v):
                yr, yi = pfft.fft4_fwd(jnp.real(v).astype(jnp.float32),
                                       jnp.imag(v).astype(jnp.float32))
            else:
                yr, yi = pfft.fft4_fwd(v.astype(jnp.float32))
            return jax.lax.complex(pfft.t_to_natural(yr),
                                   pfft.t_to_natural(yi))
        return _along_last(x, axis, f)
    return jnp.fft.fft(x, n=n, axis=axis)


def ifft(x, n=None, axis=-1, exact=False):
    ln = n if n is not None else x.shape[axis]
    if _use_fourstep(ln) and not exact:
        from audioflux_tpu.ops import pallas_fft as pfft

        def f(v):
            v = _pad_or_trim(v, ln)
            n1 = ln // 128
            yr = pfft.natural_to_t(jnp.real(v).astype(jnp.float32), n1)
            yi = pfft.natural_to_t(jnp.imag(v).astype(jnp.float32), n1)
            outr, outi = pfft.fft4_inv(yr, yi)
            return jax.lax.complex(outr, outi)
        return _along_last(x, axis, f)
    if not _use_matmul(ln):
        return jnp.fft.ifft(x, n=n, axis=axis)
    # conj trick: ifft(x) = conj(fft(conj(x))) / n
    y = fft(jnp.conj(_pad_or_trim(jnp.moveaxis(x, axis, -1), ln)))
    y = jnp.conj(y) / ln
    return jnp.moveaxis(y, -1, axis)
