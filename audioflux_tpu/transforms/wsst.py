"""Wavelet synchrosqueezed transform (CWT + squeeze in one object).

Reference ``src/wsst_algorithm.c``: instantaneous frequency from the
analytic identity Im(dCWT/CWT)/2pi (cwtObj_cwtDet derivative bank) instead
of the Synsq phase-diff; same bin mapping and complex scatter. Returns
(squeezed, raw cwt), both (..., num, data_length) ascending in frequency
like the Python wrapper (python/audioflux/wsst.py:316).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.transforms.cwt import CWT
from audioflux_tpu.transforms.synsq import _compose_order, _reassign_scatter
from audioflux_tpu.types import (SpectralFilterBankScaleType,
                                 WaveletContinueType)

__all__ = ["WSST"]


def _wsst_map(D, dD, fre_arr, *, scale_kind, num, samplate):
    """Per-cell target-bin map from the analytic instantaneous frequency
    Im(dCWT/CWT)/2pi.  Band-local (see synsq._synsq_map)."""
    denom = jnp.where(D == 0, 1.0 + 0.0j, D)
    v_signed = jnp.imag(dD / denom) / (2 * np.pi)
    v = jnp.abs(v_signed)
    f = fre_arr / samplate
    if scale_kind == "log":
        fmin, fmax = f[0], f[num - 1]
        fi = jnp.floor((jnp.log2(v) - jnp.log2(fmin)) * num
                       / (jnp.log2(fmax) - jnp.log2(fmin)) + 0.5)
    elif scale_kind == "linear":
        fmin, fmax = f[0], f[num - 1]
        fi = jnp.floor(jnp.abs(v_signed - fmin) * num / (fmax - fmin) + 0.5)
    else:
        idx = jnp.clip(jnp.searchsorted(f, v, side="right") - 1, 0, num - 2)
        in_range = (v >= f[0]) & (v < f[num - 1])
        left = v - f[idx]
        right = f[idx + 1] - v
        fi = jnp.where(left < right, idx, idx + 1)
        fi = jnp.where(in_range, fi, -1)
    return fi.astype(jnp.int32)


@partial(jax.jit, static_argnames=("scale_kind", "num", "order"))
def _squeeze(D, dD, fre_arr, *, scale_kind, num, samplate, thresh, order):
    fi = _wsst_map(D, dD, fre_arr, scale_kind=scale_kind, num=num,
                   samplate=samplate)
    fi = _compose_order(fi, num, order)
    return _reassign_scatter(D, fi, num=num, thresh=thresh)


class WSST:
    """API mirrors ``python/audioflux/wsst.py``."""

    def __init__(self, num=84, radix2_exp=12, samplate=32000,
                 low_fre=None, high_fre=None, bin_per_octave=12,
                 wavelet_type=WaveletContinueType.MORSE,
                 scale_type=SpectralFilterBankScaleType.OCTAVE,
                 gamma=None, beta=None, thresh=0.001, is_padding=True):
        self._cwt = CWT(num=num, radix2_exp=radix2_exp, samplate=samplate,
                        low_fre=low_fre, high_fre=high_fre,
                        bin_per_octave=bin_per_octave,
                        wavelet_type=wavelet_type, scale_type=scale_type,
                        gamma=gamma, beta=beta, is_padding=is_padding)
        self.num = num
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.samplate = samplate
        self.scale_type = SpectralFilterBankScaleType(scale_type)
        self.thresh = float(thresh)
        self.order = 1

    def get_fre_band_arr(self):
        return self._cwt.get_fre_band_arr()

    def get_bin_band_arr(self):
        return self._cwt.get_bin_band_arr()

    def set_order(self, order: int):
        if order >= 1:
            self.order = int(order)

    def wsst(self, data_arr):
        """(..., 2**radix2_exp) -> (squeezed, cwt), each complex
        (..., num, data_length)."""
        from audioflux_tpu.transforms.synsq import scale_kind
        D = self._cwt.cwt(data_arr)
        dD = self._cwt.cwt_det(data_arr)
        kind = scale_kind(self.scale_type)
        sq = _squeeze(D, dD, jnp.asarray(self._cwt.fre_band_arr),
                      scale_kind=kind, num=self.num,
                      samplate=float(self.samplate), thresh=self.thresh,
                      order=self.order)
        return sq, D

    def y_coords(self):
        return self._cwt.fre_band_arr

    def x_coords(self):
        return np.arange(self.fft_length) / self.samplate
