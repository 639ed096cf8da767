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

    def temporal(self, data_arr, has_energy: bool = False,
                 has_rms: bool = False, has_zcr: bool = False,
                 has_m: bool = False):
        """Energy/rms/zero-cross features of (..., n) audio.

        With any ``has_*`` flag set, returns the reference's feature dict
        (``temporal.py:94``: keys ``energy_arr``/``rms_arr``/``zcr_arr``/
        ``m_arr``).  With no flags, returns the (energy, rms, zcr) tuple
        (an extension — the reference raises); results are also cached for
        :meth:`get_data`/:meth:`ezr` etc.
        """
        x = jnp.asarray(data_arr, jnp.float32)
        energy, rms, zcr, fw = self._temporal_run(x)
        self._frames = fw
        self._energy, self._rms, self._zcr = energy, rms, zcr
        if not (has_energy or has_rms or has_zcr or has_m):
            return energy, rms, zcr
        dic = {}
        if has_energy:
            dic["energy_arr"] = energy
        if has_rms:
            dic["rms_arr"] = rms
        if has_zcr:
            dic["zcr_arr"] = zcr
        if has_m:
            dic["m_arr"] = fw
        return dic

    def _temporal_impl(self, x):
        frames = frame_signal(x, self.frame_length, self.slide_length)
        w = jnp.asarray(self.window)
        fw = frames * w
        energy = jnp.sum(fw * fw, axis=-1)
        rms = jnp.sqrt(energy / self.frame_length)
        sign_change = (fw[..., 1:] * fw[..., :-1] < 0).astype(jnp.float32)
        zcr = jnp.sum(sign_change, axis=-1) / self.frame_length
        return energy, rms, zcr, fw

    def get_data(self, data_arr=None):
        """(energy, rms, zcr, windowed frame matrix (..., T, frame_length)).

        Deprecated in the reference in favour of :meth:`temporal`
        (``temporal.py:182``); accepts ``data_arr`` to compute in place,
        or reads the cache from the last :meth:`temporal` call.
        """
        if data_arr is not None:
            self.temporal(data_arr)
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
