"""BFT ("Based Fourier Transform") — the v2 spectrogram front-end.

Reference ``src/bft_algorithm.c``: an (optionally reassigned) STFT followed
by a filterbank projection. Complex results keep phase (POWER squares the
complex value, bft_algorithm.c:457-470); real results go power/mag (+norm)
then filterbank einsum (:488-530). LINEAR scale is a bin slice
[low_index, high_index] rather than a matmul (:472-486). Optional temporal
(energy/rms/zcr) side data mirrors bftObj_getTemporalData.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.filterbank.auditory import auditory_filter_bank
from audioflux_tpu.transforms.reassign import Reassign
from audioflux_tpu.transforms.temporal import Temporal
from audioflux_tpu.types import (ReassignType, SpectralDataType,
                                 SpectralFilterBankNormalType,
                                 SpectralFilterBankScaleType,
                                 SpectralFilterBankStyleType, WindowType)

__all__ = ["BFT"]

_HIGHEST = jax.lax.Precision.HIGHEST


def _pick_tile(n_frames: int, tile: int):
    """Choose (tile, padded_frames) for the fused kernel: tile must be a
    multiple of 8 dividing the padded frame count.  Scans a few padded
    counts and keeps the one whose largest admissible tile wastes the
    least (tiles >= ~100 are perf-flat per the r2 tile sweep, so prefer
    minimal padding over maximal tile)."""
    t8 = -(-n_frames // 8) * 8
    tile = max(8, min(tile, t8)) // 8 * 8  # kernel tiles must be 8-aligned
    fallback = None
    for t_pad in range(t8, t8 + 129, 8):
        cand = next(c for c in range(tile, 7, -8) if t_pad % c == 0)
        if fallback is None:
            fallback = (cand, t_pad)
        if cand >= min(96, tile):
            return cand, t_pad
    return fallback


class BFT:
    """API mirrors ``python/audioflux/bft.py:142-509``."""

    def __init__(self, num, radix2_exp=12, samplate=32000,
                 low_fre=None, high_fre=None, bin_per_octave=12,
                 window_type=WindowType.HANN,
                 slide_length=None,
                 scale_type=SpectralFilterBankScaleType.LINEAR,
                 style_type=SpectralFilterBankStyleType.SLANEY,
                 normal_type=SpectralFilterBankNormalType.NONE,
                 data_type=SpectralDataType.MAG,
                 is_reassign=False, is_temporal=False):
        S = SpectralFilterBankScaleType
        scale = S(scale_type)
        if scale > S.LOG:
            raise ValueError(f"BFT does not support scale {scale.name}")
        fft_length = 1 << radix2_exp
        if num > fft_length // 2 + 1:
            raise ValueError(f"num={num} is too large")

        log_like = scale in (S.OCTAVE, S.LOG)
        # defaults (bft_algorithm.c:155-190): log scales span A-45..A+38
        if low_fre is None:
            low_fre = (2.0 ** (-45 / 12.0) * 440.0) if log_like else 0.0
        if high_fre is None:
            high_fre = ((2.0 ** (38 / 12.0) * 440.0) if log_like
                        else samplate / 2.0)
        if high_fre < low_fre:
            low_fre = (2.0 ** (-45 / 12.0) * 440.0) if log_like else 0.0
            high_fre = ((2.0 ** (38 / 12.0) * 440.0) if log_like
                        else samplate / 2.0)

        low_index = high_index = 0
        if scale == S.LINEAR:
            # reviseLinearFre isEdge=1 (bft_algorithm.c:143-151)
            det = samplate / float(fft_length)
            low_index = int(np.round(np.float32(low_fre) / np.float32(det)))
            high_index = low_index + num - 1
            low_fre = low_index * det
            high_fre = high_index * det
            if high_fre > samplate / 2.0:
                raise ValueError("scale linear: lowFre and num too large")

        self.num = int(num)
        self.radix2_exp = radix2_exp
        self.fft_length = fft_length
        self.samplate = samplate
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.bin_per_octave = bin_per_octave
        self.window_type = WindowType(window_type)
        self.slide_length = slide_length if slide_length else fft_length // 4
        self.scale_type = scale
        self.style_type = SpectralFilterBankStyleType(style_type)
        self.normal_type = SpectralFilterBankNormalType(normal_type)
        self.data_type = SpectralDataType(data_type)
        self.is_reassign = bool(is_reassign)
        self.is_temporal = bool(is_temporal)
        self.low_index = low_index
        self.high_index = high_index
        self.result_type = 0
        self.norm_value = 1.0

        self._re = Reassign(
            radix2_exp=radix2_exp, samplate=samplate,
            window_type=self.window_type, slide_length=self.slide_length,
            re_type=(ReassignType.ALL if self.is_reassign
                     else ReassignType.NONE))

        if scale == S.LINEAR:
            det = samplate / float(fft_length)
            self.filter_bank = None
            self.fre_band_arr = (np.arange(low_index, high_index + 1) * det
                                 ).astype(np.float32)
            self.bin_band_arr = np.arange(low_index, high_index + 1,
                                          dtype=np.int32)
        else:
            fb, fre, bins = auditory_filter_bank(
                num, fft_length, samplate, scale, self.style_type,
                self.normal_type, self.low_fre, self.high_fre,
                bin_per_octave)
            self.filter_bank = fb
            self.fre_band_arr = fre
            self.bin_band_arr = bins

        self._temp = (Temporal(frame_length=fft_length,
                               slide_length=self.slide_length,
                               window_type=self.window_type)
                      if self.is_temporal else None)
        # the full pipeline (reassign STFT -> power/mag -> filterbank)
        # under one jit: the post-reassign ops are small per-element work,
        # but eagerly they each pay a device dispatch, which over the axon
        # tunnel costs more than the whole computation.  result_type and
        # norm enter as static args (changing them retraces; both are
        # rarely-toggled config, not data).
        self._bft_run = jax.jit(self._bft_impl,
                                static_argnames=("rt", "norm_value"))

    # ------------------------------------------------------------------
    def cal_time_length(self, data_length: int) -> int:
        return self._re.cal_time_length(data_length)

    def get_fre_band_arr(self):
        return self.fre_band_arr

    def get_bin_band_arr(self):
        return self.bin_band_arr

    def set_result_type(self, result_type: int):
        if result_type not in (0, 1):
            raise ValueError("result_type must be 0 or 1")
        self.result_type = result_type

    def set_data_norm_value(self, norm_value: float):
        if norm_value > 0:
            self.norm_value = float(norm_value)

    # ------------------------------------------------------------------
    def bft(self, data_arr, result_type: int = None):
        """(..., n) -> (..., num, time); complex64 when result_type 0."""
        if result_type is not None:
            self.set_result_type(result_type)
        out = self._bft_run(jnp.asarray(data_arr, jnp.float32),
                            rt=self.result_type, norm_value=self.norm_value)
        if self._temp is not None:
            self._temp.temporal(data_arr)
        return out

    def _bft_impl(self, data_arr, *, rt, norm_value):
        D = self._re.reassign(data_arr)  # complex (..., m, T)
        D = jnp.swapaxes(D, -1, -2)      # (..., T, m)
        S = SpectralFilterBankScaleType
        fb = (None if self.filter_bank is None
              else jnp.asarray(self.filter_bank))

        if rt == 0:  # complex result
            if self.data_type == SpectralDataType.POWER:
                re, im = jnp.real(D), jnp.imag(D)
                D = (re * re - im * im) + 1j * (2 * re * im)
            if self.scale_type == S.LINEAR:
                out = D[..., self.low_index:self.high_index + 1]
            else:
                out = (jnp.einsum("...tf,nf->...tn", jnp.real(D), fb,
                                  precision=_HIGHEST)
                       + 1j * jnp.einsum("...tf,nf->...tn", jnp.imag(D), fb,
                                         precision=_HIGHEST))
        else:  # real result
            P = jnp.real(D) ** 2 + jnp.imag(D) ** 2
            if self.data_type == SpectralDataType.MAG:
                P = jnp.sqrt(P)
            elif norm_value != 1:
                P = jnp.power(P, norm_value)
            if self.scale_type == S.LINEAR:
                out = P[..., self.low_index:self.high_index + 1]
            else:
                out = jnp.einsum("...tf,nf->...tn", P, fb,
                                 precision=_HIGHEST)
            if self.data_type == SpectralDataType.MAG and norm_value != 1:
                out = jnp.power(out, norm_value)

        return jnp.swapaxes(out, -1, -2)

    def bft_fused(self, data_arr, cc_num: int = 13, tile: int = 200):
        """Bulk throughput path: fused Pallas spectrogram (+ xxcc).

        Routes the BFT hot loop (frame -> window -> DFT -> power ->
        filterbank [-> log-DCT]) through the fused kernel
        (``ops.pallas_spectrogram``), the same fast path ``bench.py``
        measures.  Requires the plain real/POWER configuration
        (result_type 1, POWER data, norm 1, no reassign).  LINEAR scale
        runs with an exact 0/1 bin-selection bank (0/1 is exact in the
        kernel's bf16 splits, so the linear power spectrogram carries the
        same ~2e-6 relative error as the mel path).  Inputs whose frame
        count is not a tile multiple are zero-padded and the output is
        sliced back — any (..., n >= fft) batch works.
        Returns (spec (..., num, T), cc (..., cc_num, T)); numerics are
        bf16x3 (~2e-6 relative) vs the exact ``bft`` path.
        """
        S = SpectralFilterBankScaleType
        if (self.data_type != SpectralDataType.POWER
                or self.norm_value != 1 or self.is_reassign):
            raise ValueError("bft_fused needs POWER data, norm 1 and no "
                             "reassign; use .bft()")
        from audioflux_tpu.ops.pallas_spectrogram import (FusedMelPlan,
                                                          fused_mel_mfcc)
        from audioflux_tpu.transforms.spectrogram import dct_matrix
        cc_keep = cc_num
        cc_num = max(cc_num, 1)  # zero-width DCT blocks are illegal
        key = ("_fused_plan", cc_num)
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        plan = cache.get(key)
        if plan is None:
            from audioflux_tpu.ops.window import get_fft_window
            win = get_fft_window(self.window_type,
                                 1 << self.radix2_exp)
            fb = self.filter_bank
            if fb is None:  # LINEAR: selection of bins low..high (exact)
                fb = np.zeros((self.num, self.fft_length // 2 + 1),
                              np.float32)
                fb[np.arange(self.num),
                   self.low_index + np.arange(self.num)] = 1.0
            plan = FusedMelPlan(win, fb, dct_matrix(self.num)[:cc_num],
                                self.slide_length)
            cache[key] = plan
        x = jnp.asarray(data_arr, jnp.float32)
        n = x.shape[-1]
        if n < self.fft_length:
            raise ValueError(f"input too short: n={n} < fft="
                             f"{self.fft_length}")
        n_frames = (n - self.fft_length) // self.slide_length + 1
        tile, t_pad = _pick_tile(n_frames, tile)
        need = (t_pad - 1) * self.slide_length + self.fft_length
        if need > n:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, need - n)]
            x = jnp.pad(x, pad)
        spec, cc = fused_mel_mfcc(plan, x, tile=tile)
        if t_pad != n_frames:
            spec = spec[..., :n_frames]
            cc = cc[..., :n_frames]
        return spec, cc[..., :cc_keep, :]

    def get_temporal_data(self):
        if self._temp is None:
            raise RuntimeError("BFT was created with is_temporal=False")
        e, r, z, _ = self._temp.get_data()
        return e, r, z

    # ------------------------------------------------------------------
    def y_coords(self):
        return self.fre_band_arr

    def x_coords(self, data_length: int):
        T = self.cal_time_length(data_length)
        return np.arange(T) * self.slide_length / self.samplate
