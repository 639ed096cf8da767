"""Analytic signal via FFT (Hilbert transform).

Reference ``src/dsp/hilbert_algorithm.c``: mask [1, 2..2, 1, 0..0] on the
spectrum, IFFT back; real part is the input, imaginary part its Hilbert
transform.
"""

from __future__ import annotations

import jax.numpy as jnp
from audioflux_tpu.ops import fft as afft
import numpy as np

__all__ = ["Hilbert", "hilbert"]


def hilbert(data_arr, fft_length: int = None):
    """(..., n) -> complex analytic signal (..., fft_length or n)."""
    x = jnp.asarray(data_arr, jnp.float32)
    L = fft_length or x.shape[-1]
    F = afft.fft(x, n=L, axis=-1)
    h = np.zeros(L, np.float32)
    h[0] = 1.0
    h[L // 2] = 1.0
    h[1:L // 2] = 2.0
    return afft.ifft(F * h, axis=-1)


class Hilbert:
    """Object API mirroring ``hilbertObj_*``."""

    def __init__(self, radix2_exp: int = 12):
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp

    def hilbert(self, data_arr):
        return hilbert(data_arr, self.fft_length)
