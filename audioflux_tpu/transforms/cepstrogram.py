"""Cepstrogram — per-frame cepstrum matrix with envelope/details liftering.

Reference ``src/cepstrogram_algorithm.c``: STFT (default rect window) ->
power -> log(max(p,1e-16)) -> IFFT = real cepstrum; the envelope keeps
quefrencies [0..cep_num] (mirrored symmetrically) and FFTs back, the
details keep the complementary band. The reference's per-frame FFT loops
(:131-199) become two batched ffts over the (..., T, fft) tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.ops.frame import cal_time_length, frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.types import WindowType

__all__ = ["Cepstrogram"]


class Cepstrogram:
    """API mirrors ``python/audioflux/cepstrogram.py:83-227``."""

    def __init__(self, radix2_exp: int = 12, samplate: int = 32000,
                 window_type: WindowType = WindowType.RECT,
                 slide_length: int = 1024):
        if not 1 <= radix2_exp <= 30:
            raise ValueError("radix2_exp must be in [1, 30]")
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.fft_length = 1 << radix2_exp
        self.window_type = WindowType(window_type)
        self.slide_length = (slide_length if slide_length > 0
                             else self.fft_length // 4)
        self.window = get_fft_window(self.window_type, self.fft_length)
        # one jitted program per (shape, cep_num): eager per-op dispatch
        # over the axon tunnel costs more than the transform
        self._cep_run = jax.jit(self._cep_impl, static_argnames=("cep_num",))

    def cal_time_length(self, data_length: int) -> int:
        return cal_time_length(data_length, self.fft_length, self.slide_length)

    def cepstrogram(self, data_arr, cep_num: int = 4):
        """(..., n) -> (cepstrums, envelope, details), each
        (..., fft_length//2+1, time)."""
        if not 4 <= cep_num <= 128:
            raise ValueError("cep_num must be in [4, 128]")
        x = jnp.asarray(data_arr, jnp.float32)
        return self._cep_run(x, cep_num=cep_num)

    def _cep_impl(self, data_arr, *, cep_num):
        L = self.fft_length
        m = L // 2 + 1
        x = jnp.asarray(data_arr, jnp.float32)
        frames = frame_signal(x, L, self.slide_length)
        # exact fft tier: the log-power cepstrum amplifies the four-step
        # kernel's ~1e-5 error on near-zero bins (see ops/fft.py docstring)
        spec = afft.fft(frames * jnp.asarray(self.window), axis=-1,
                        exact=True)
        logp = jnp.log(jnp.maximum(jnp.abs(spec) ** 2, 1e-16))
        ceps = jnp.real(afft.ifft(logp, axis=-1, exact=True))  # (..., T, L)

        # envelope: keep [0..cep], mirror [1..cep] into the tail
        # (cepstrogram_algorithm.c:160-168)
        env_mask = np.zeros((L,), np.float32)
        env_mask[:cep_num + 1] = 1.0
        env_mask[L - cep_num:] = 1.0  # tail j: arr[L-j-1] = arr[j+1]
        env_in = ceps * env_mask
        envelope = jnp.real(afft.fft(env_in, axis=-1, exact=True))[..., :m]

        # details: keep [cep+1 .. L-cep] (the complementary copy length is
        # fftLength-2*cep_num, cepstrogram_algorithm.c:184-186)
        det_mask = np.zeros((L,), np.float32)
        det_mask[cep_num + 1:cep_num + 1 + (L - 2 * cep_num)] = 1.0
        det_in = ceps * det_mask
        details = jnp.real(afft.fft(det_in, axis=-1, exact=True))[..., :m]

        c = ceps[..., :m]
        sw = lambda a: jnp.swapaxes(a, -1, -2)
        return sw(c), sw(envelope), sw(details)

    def y_coords(self):
        return np.linspace(0, self.samplate / 2, self.fft_length // 2 + 1)

    def x_coords(self, data_length: int):
        T = self.cal_time_length(data_length)
        return np.arange(T) * self.slide_length / self.samplate
