"""Deconv — spectrum deconvolution into timbre (formant) and pitch residue.

Reference ``src/feature/deconv_algorithm.c:106-161``: per frame, the band
vector is zero-padded to L = ceil_pow2(2*num), FFT'd; the cepstral magnitude
|F| IFFTs back to the timbre component, and F/|F| (whitened spectrum) IFFTs
to the pitch component. Here the per-frame loop is one batched FFT over a
(..., T, L) tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

__all__ = ["Deconv"]


def _ceil_pow2(n: int) -> int:
    L = 1
    while L < n:
        L <<= 1
    return L


class Deconv:
    """API mirrors ``python/audioflux/feature/deconv.py:65-138``."""

    def __init__(self, num: int):
        if num < 2:
            raise ValueError("num must be >= 2")
        self.num = int(num)
        self._L = _ceil_pow2(2 * self.num)

    def set_time_length(self, time_length: int):  # compat no-op
        pass

    def deconv(self, m_data_arr):
        """(..., num, T) mag/power spectrogram -> (timbre, pitch), each
        (..., num, T)."""
        num, L = self.num, self._L
        x = jnp.swapaxes(jnp.asarray(m_data_arr, jnp.float32), -1, -2)
        F = afft.fft(x, n=L, axis=-1)
        mag = jnp.abs(F)
        timbre = jnp.real(afft.ifft(mag, axis=-1))[..., :num]
        white = F / jnp.maximum(mag, 1e-16)
        pitch = jnp.real(afft.ifft(white, axis=-1))[..., :num]
        return jnp.swapaxes(timbre, -1, -2), jnp.swapaxes(pitch, -1, -2)
