"""Phase vocoder time-scale modification of an STFT matrix.

Reference ``src/dsp/phase_vocoder.c``: output frame i interpolates the
magnitudes of input frames floor(i*rate) and +1 and advances an
accumulated phase by the wrapped instantaneous-frequency deviation. The
per-frame loop's phase accumulation is a ``lax.scan``; everything inside
a step is vectorized over bins (and leading batch dims).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["phase_vocoder"]


@partial(jax.jit, static_argnames=("slide_length", "rate", "t_len"))
def _pv_impl(D, *, slide_length, rate, t_len):
    # D: (..., T, m) complex rfft-size spectrum
    T, m = D.shape[-2], D.shape[-1]
    phi = jnp.linspace(0.0, np.pi * slide_length, m)
    times = np.arange(0, T, rate, dtype=np.float64)[:t_len]
    ks = np.floor(times).astype(np.int64)
    alphas = (times - np.floor(times)).astype(np.float32)

    # gather input frames once (clipped; out-of-range rows zeroed)
    k0 = np.clip(ks, 0, T - 1)
    k1 = np.clip(ks + 1, 0, T - 1)
    A = jnp.where((ks < T).reshape((-1, 1)), D[..., k0, :], 0)
    B = jnp.where((ks + 1 < T).reshape((-1, 1)), D[..., k1, :], 0)

    magA = jnp.abs(A)
    magB = jnp.abs(B)
    angA = jnp.angle(A)
    angB = jnp.angle(B)
    mags = (1.0 - alphas[..., None]) * magA + alphas[..., None] * magB

    def step(phase, inp):
        mag_i, angA_i, angB_i = inp
        out = mag_i * jnp.exp(1j * phase.astype(jnp.complex64))
        dev = angB_i - angA_i - phi
        dev = dev - 2 * np.pi * jnp.round(dev / (2 * np.pi))
        return phase + phi + dev, out

    phase0 = jnp.angle(D[..., 0, :])
    mags_t = jnp.moveaxis(mags, -2, 0)
    angA_t = jnp.moveaxis(angA, -2, 0)
    angB_t = jnp.moveaxis(angB, -2, 0)
    _, outs = jax.lax.scan(step, phase0, (mags_t, angA_t, angB_t))
    return jnp.moveaxis(outs, 0, -2)  # (..., t_len, m)


def phase_vocoder(D, slide_length: int, rate: float):
    """D: complex (..., fre, time) -> (..., fre, ceil(time/rate))."""
    D = jnp.asarray(D)
    Dt = jnp.swapaxes(D, -1, -2)
    T = Dt.shape[-2]
    t_len = int(np.ceil(T / rate))
    out = _pv_impl(Dt, slide_length=slide_length, rate=float(rate),
                   t_len=t_len)
    return jnp.swapaxes(out, -1, -2)
