"""Temporal features — frame-wise energy / RMS / zero-cross rate (+ EZR).

Reference ``src/temporal_algorithm.c``: frames of ``frame_length`` every
``slide_length`` samples are windowed, then energy = sum(x^2),
rms = sqrt(energy/N), zcr = sign-change count / N
(flux_vector.c:1765-1789); ezr = log10(1+E*gamma)/(zcr*N+1)
(temporal_algorithm.c:temporalObj_ezr). All frames reduce in one fused
XLA computation; batched over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.ops.frame import frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.types import WindowType

__all__ = ["Temporal"]


class Temporal:
    """API mirrors ``python/audioflux/temporal.py:60-298``."""

    def __init__(self, frame_length: int = 2048, slide_length: int = 512,
                 window_type: WindowType = WindowType.HANN):
        self.frame_length = int(frame_length)
        self.slide_length = int(slide_length)
        self.window_type = WindowType(window_type)
        self.window = get_fft_window(self.window_type, self.frame_length)
        self._frames = None  # windowed frames cache for get_data
        # all frame reductions in one jitted program (eager per-op
        # dispatch over the axon tunnel costs more than the math)
        self._temporal_run = jax.jit(self._temporal_impl)

    def cal_time_length(self, data_length: int) -> int:
        if data_length < self.frame_length:
            return 0
        return (data_length - self.frame_length) // self.slide_length + 1

    def temporal(self, data_arr):
        """Compute and cache (energy, rms, zcr) for (..., n) audio."""
        x = jnp.asarray(data_arr, jnp.float32)
        energy, rms, zcr, fw = self._temporal_run(x)
        self._frames = fw
        self._energy, self._rms, self._zcr = energy, rms, zcr
        return energy, rms, zcr

    def _temporal_impl(self, x):
        frames = frame_signal(x, self.frame_length, self.slide_length)
        w = jnp.asarray(self.window)
        fw = frames * w
        energy = jnp.sum(fw * fw, axis=-1)
        rms = jnp.sqrt(energy / self.frame_length)
        sign_change = (fw[..., 1:] * fw[..., :-1] < 0).astype(jnp.float32)
        zcr = jnp.sum(sign_change, axis=-1) / self.frame_length
        return energy, rms, zcr, fw

    def get_data(self):
        """(energy, rms, zcr, windowed frame matrix (..., T, frame_length))."""
        if self._frames is None:
            raise RuntimeError("call temporal() first")
        return self._energy, self._rms, self._zcr, self._frames

    def ezr(self, gamma: float = 1.0):
        """Energy/zero-cross ratio of the cached frames."""
        if self._frames is None:
            raise RuntimeError("call temporal() first")
        v1 = jnp.log10(1.0 + self._energy * gamma)
        v2 = self._zcr * self.frame_length + 1.0
        return v1 / v2
