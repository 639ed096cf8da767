"""Pseudo wavelet transform — auditory-filterbank-shaped CWT.

Reference ``src/pwt_algorithm.c``: same full-signal-FFT -> bank multiply ->
per-band IFFT pipeline as CWT, but the bank is a *pseudo* auditory
filterbank (real, full-fftLength grid, auditory_filterBank with isPseudo=1,
pwt_algorithm.c:315-319). Rows stay in ascending frequency order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from audioflux_tpu.filterbank.auditory import auditory_filter_bank, _revise_fre
from audioflux_tpu.types import (SpectralFilterBankNormalType,
                                 SpectralFilterBankScaleType,
                                 SpectralFilterBankStyleType)
from audioflux_tpu.utils.convert import note_to_hz

__all__ = ["PWT"]


class PWT:
    """API mirrors ``python/audioflux/pwt.py:116-287``."""

    def __init__(self, num=84, radix2_exp=12, samplate=32000,
                 low_fre=None, high_fre=None, bin_per_octave=12,
                 scale_type=SpectralFilterBankScaleType.OCTAVE,
                 style_type=SpectralFilterBankStyleType.SLANEY,
                 normal_type=SpectralFilterBankNormalType.NONE,
                 is_padding=True):
        S = SpectralFilterBankScaleType
        scale_type = S(scale_type)
        if scale_type > S.LOG:
            raise ValueError(f"PWT does not support scale {scale_type.name}")
        data_length = 1 << radix2_exp
        if not 2 <= num <= data_length // 2 + 1:
            raise ValueError(f"num={num} out of range")

        log_like = scale_type in (S.OCTAVE, S.LOG)
        if low_fre is None:
            low_fre = note_to_hz("C1") if log_like else 0.0
        if high_fre is None:
            high_fre = samplate / 2.0
        if log_like and low_fre < round(note_to_hz("C1"), 3):
            raise ValueError(f"{scale_type.name} low_fre must be >= 32.703")

        if scale_type in (S.LINEAR, S.OCTAVE):
            low_fre, high_fre, _ = _revise_fre(
                scale_type, num, low_fre, high_fre, bin_per_octave,
                samplate, data_length, is_edge=True)
            if high_fre > samplate / 2.0:
                raise ValueError("lowFre and num too large, overflow")

        self.num = num
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.data_length = data_length
        self.fft_length = data_length
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.bin_per_octave = bin_per_octave
        self.scale_type = scale_type
        self.style_type = SpectralFilterBankStyleType(style_type)
        self.normal_type = SpectralFilterBankNormalType(normal_type)
        self.is_padding = bool(is_padding)

        if self.is_padding:
            self.pad_length = (data_length // 2 if data_length <= 1e5
                               else int(np.ceil(np.log2(data_length))))
        else:
            self.pad_length = 0
        w_length = data_length + 2 * self.pad_length

        fb, fre, bins = auditory_filter_bank(
            num, w_length, samplate, scale_type, self.style_type,
            self.normal_type, self.low_fre, self.high_fre, bin_per_octave,
            is_pseudo=True)
        self._bank = fb
        self.fre_band_arr = fre
        self.bin_band_arr = bins
        self._row_h = None
        if w_length & (w_length - 1) == 0:
            from audioflux_tpu.ops.pallas_cwt import band_row_counts
            # stage-1 support rows for the fused kernel (pseudo auditory
            # banks live on the positive-frequency half, so the same
            # leading-prefix slicing as CWT applies)
            self._row_h = band_row_counts(fb, w_length)
        # whole pad->FFT->bank->IFFT pipeline under one jit (eager
        # per-op dispatch over the axon tunnel costs more than the math)
        self._pwt_run = jax.jit(self._pwt_impl)

    def get_fre_band_arr(self):
        return self.fre_band_arr

    def get_bin_band_arr(self):
        return self.bin_band_arr

    def pwt(self, data_arr):
        """(..., data_length) -> complex64 (..., num, data_length)."""
        x = jnp.asarray(data_arr, jnp.float32)
        if x.shape[-1] != self.data_length:
            raise ValueError(f"data length must be exactly {self.data_length}")
        return self._pwt_run(x, jnp.asarray(self._bank))

    def _pwt_impl(self, x, bank):
        # same fused bank-multiply + four-step matmul IFFT pipeline as
        # CWT (ops/pallas_cwt.py) — PWT is the identical
        # ifft(bank * F)[p : p+L] convolution, pwt_algorithm.c.
        # NOTE real banks (no det): the reference PWT has no derivative
        # form, so det is always False here.
        from audioflux_tpu.transforms.cwt import _cwt_conv_body
        return _cwt_conv_body(x, bank, det=False,
                              pad_length=self.pad_length,
                              data_length=self.data_length,
                              row_h=self._row_h)

    def y_coords(self):
        return self.fre_band_arr

    def x_coords(self):
        return np.arange(self.data_length) / self.samplate
