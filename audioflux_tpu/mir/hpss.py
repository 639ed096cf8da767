"""Harmonic/percussive source separation (median-filter + Wiener masks).

Reference ``src/mir/hpss_algorithm.c``: STFT (hamm) -> magnitude ->
median filter along time (h_order) and frequency (p_order) -> soft masks
h^2/(h^2+p^2) -> two ISTFTs (:193-330). Everything is one fused jitted
computation; the per-frame C loops disappear into batched ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.ops.filter import median_filter
from audioflux_tpu.ops.pallas_median import median_filter_last_axis
from audioflux_tpu.ops.frame import cal_time_length, frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.transforms.stft import _istft_impl
from audioflux_tpu.types import WindowType

__all__ = ["HPSS"]


@partial(jax.jit, static_argnames=("fft_length", "slide_length", "h_order",
                                   "p_order"))
def _hpss_impl(x, window, *, fft_length, slide_length, h_order, p_order):
    frames = frame_signal(x, fft_length, slide_length)
    D = jnp.fft.rfft(frames * window, axis=-1)  # (..., T, m)
    mag = jnp.abs(D)
    phase = D / jnp.maximum(mag, 1e-16)

    # Pallas sliding-median kernel on TPU, jnp fallback elsewhere
    h = jnp.swapaxes(
        median_filter_last_axis(jnp.swapaxes(mag, -1, -2), h_order), -1, -2)
    p = median_filter_last_axis(mag, p_order)
    h2, p2 = h * h, p * p
    denom = jnp.maximum(h2 + p2, 1e-16)
    Hm = h2 / denom * mag
    Pm = p2 / denom * mag

    def resynth(m):
        spec = jnp.swapaxes(m * phase, -1, -2)  # (..., m, T)
        return _istft_impl(spec, window, fft_length=fft_length,
                           slide_length=slide_length, method_type=0)

    return resynth(Hm), resynth(Pm)


class HPSS:
    """API mirrors ``python/audioflux/mir/hpss.py:99-230``."""

    def __init__(self, radix2_exp: int = 12,
                 window_type: WindowType = WindowType.HAMM,
                 slide_length: int = 1024, h_order: int = 21,
                 p_order: int = 31):
        if h_order < 1 or h_order % 2 == 0 or p_order < 1 or p_order % 2 == 0:
            raise ValueError("h_order/p_order must be odd positive")
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.window_type = WindowType(window_type)
        self.slide_length = slide_length if slide_length else self.fft_length // 4
        self.h_order = h_order
        self.p_order = p_order
        self.window = get_fft_window(self.window_type, self.fft_length)

    def cal_time_length(self, data_length: int) -> int:
        return cal_time_length(data_length, self.fft_length, self.slide_length)

    def cal_data_length(self, time_length: int) -> int:
        return (time_length - 1) * self.slide_length + self.fft_length

    def hpss(self, data_arr):
        """(..., n) -> (harmonic, percussive), each (..., out_n)."""
        return _hpss_impl(jnp.asarray(data_arr, jnp.float32),
                          jnp.asarray(self.window),
                          fft_length=self.fft_length,
                          slide_length=self.slide_length,
                          h_order=self.h_order, p_order=self.p_order)
