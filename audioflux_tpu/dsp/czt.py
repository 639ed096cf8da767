"""Chirp-Z transform (zoom spectrum) via Bluestein's algorithm.

Reference ``src/dsp/czt_algorithm.c``: zoom over normalized frequencies
[low_w, high_w] with A = exp(j*2pi*low_w), W = exp(-j*2pi*(high_w-low_w)/N).
(Note: the reference C reads 2N samples from an N-sample Python buffer —
a latent overread; this implementation uses the intended N-point input.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from audioflux_tpu.ops import fft as afft
import numpy as np

__all__ = ["CZT", "czt"]


def czt(data_arr, low_w: float, high_w: float, out_length: int = None):
    """Zoom DFT of (..., n) over [low_w, high_w] (normalized to samplate).

    Returns complex64 (..., out_length) with out_length defaulting to n:
    X[k] = sum_n x[n] * exp(-j*2pi*(low_w + k*(high_w-low_w)/out)*n).
    """
    x = jnp.asarray(data_arr)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    n = x.shape[-1]
    m = out_length or n
    L = 1
    while L < n + m - 1:
        L <<= 1

    w_step = (high_w - low_w) / m
    k = np.arange(max(n, m), dtype=np.float64)
    wk2 = np.exp(-1j * 2 * np.pi * w_step * (k * k) / 2)  # W^(k^2/2)
    a_k = np.exp(-1j * 2 * np.pi * low_w * np.arange(n))

    g = x * jnp.asarray((a_k * wk2[:n]).astype(np.complex64))
    h = np.zeros(L, np.complex128)
    h[:m] = np.conj(wk2[:m])
    h[L - n + 1:] = np.conj(wk2[1:n][::-1])
    Fh = jnp.asarray(np.fft.fft(h).astype(np.complex64))
    Fg = afft.fft(g, n=L, axis=-1)
    y = afft.ifft(Fg * Fh, axis=-1)[..., :m]
    return y * jnp.asarray(wk2[:m].astype(np.complex64))


class CZT:
    """API mirrors ``python/audioflux/dsp/czt.py``."""

    def __init__(self, radix2_exp: int = 12):
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp

    def czt(self, data_arr, low_w: float, high_w: float):
        if not (0 <= low_w < high_w <= 1):
            raise ValueError("require 0 <= low_w < high_w <= 1")
        return czt(data_arr, low_w, high_w)
