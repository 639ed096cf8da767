"""Real-time instrument tuner.

Reference ``src/track/tune_track.c``: composes YIN + FFP + harmonic ratio +
two spectrograms with an onset/hold hysteresis state machine (flux-peak
entry with 1-2 frame delay, agreement gating between the YIN and FFP
estimates, dB/harmonicity cut thresholds, streaming ``clear``).

This implementation composes the same ported components with the same
thresholds (inThresh 0.2 / updateThresh 0.4 / cutThresh 0.6 /
inFluxThresh 120, tune_track.c:186-210) but a simplified state machine:
the reference's per-case candidate surgery on FFP internals (which hang
off the unported _queue engine) is replaced by YIN/FFP agreement gating.
Documented deviation — see README "known deviations".
"""

from __future__ import annotations

import numpy as np

from audioflux_tpu.mir.harmonic_ratio import HarmonicRatio
from audioflux_tpu.mir.pitch_ffp import PitchFFP
from audioflux_tpu.mir.pitch_yin import PitchYIN
from audioflux_tpu.transforms.spectrogram import BarkSpectrogram

__all__ = ["TuneTrack"]


def _is_similar(f1, f2):
    """Same midi tone (tune_track.c:__isSimilar)."""
    if f1 <= 0 or f2 <= 0:
        return False
    m1 = round(12 * np.log2(f1 / 440) + 69)
    m2 = round(12 * np.log2(f2 / 440) + 69)
    return m1 == m2


class TuneTrack:
    """API mirrors the C ``tuneTrackObj_*`` surface."""

    def __init__(self, samplate=32000, low_fre=27.0, high_fre=4000.0,
                 radix2_exp=12, slide_length=None, is_continue=False):
        fft_length = 1 << radix2_exp
        self.samplate = samplate
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.radix2_exp = radix2_exp
        self.fft_length = fft_length
        self.slide_length = slide_length if slide_length else fft_length // 4

        self._yin = PitchYIN(samplate=samplate, radix2_exp=radix2_exp,
                             slide_length=self.slide_length)
        self._ffp = PitchFFP(samplate=samplate, low_fre=low_fre,
                             high_fre=high_fre, radix2_exp=radix2_exp,
                             slide_length=self.slide_length)
        self._hr = HarmonicRatio(samplate=samplate, radix2_exp=radix2_exp - 1,
                                 slide_length=self.slide_length)
        self._spec = BarkSpectrogram(num=64, samplate=samplate,
                                     radix2_exp=radix2_exp,
                                     slide_length=self.slide_length)
        # thresholds (tune_track.c:186-210)
        self.in_thresh = 0.2
        self.update_thresh = 0.4
        self.cut_thresh = 0.6
        self.in_flux_thresh = 120.0
        self.temp_base = -18.0
        self.update_min = 5.0 / 8.0
        self.update_max = 1.0

        self.clear()

    # -- streaming state ------------------------------------------------
    def clear(self):
        """Reset tracking state (tuneTrackObj_clear)."""
        self._prev_spec = None
        self._prev_flux = 0.0
        self._left_flux = 0.0
        self._hold_fre = 0.0
        self._hold_count = 0
        self._in_flux = 0

    def set_temp_base(self, temp_base: float):
        self.temp_base = float(temp_base)

    def set_update_base(self, min_base: float, max_base: float):
        if min_base >= 1:
            self.update_min = float(min_base)
        if max_base >= 1:
            self.update_max = float(max_base)

    def cal_time_length(self, data_length: int) -> int:
        return self._ffp.cal_time_length(data_length)

    # -------------------------------------------------------------------
    def tune(self, data_arr):
        """(n,) -> per-frame tracked frequency (0 where no stable tone)."""
        x = np.asarray(data_arr, np.float32)
        T = self.cal_time_length(len(x))
        if T <= 0:
            return np.zeros(0, np.float32)

        yin_fre, yin_val = [np.asarray(a) for a in self._yin.pitch(x)]
        ffp_fre, ffp_db = self._ffp.pitch(x)
        hr = np.asarray(self._hr.harmonic_ratio(x))
        spec = np.asarray(self._spec.spectrogram(x))  # (num, T')

        n_frames = min(T, len(yin_fre), len(ffp_fre), spec.shape[-1])
        out = np.zeros(n_frames, np.float32)
        flux_arr = np.zeros(n_frames, np.float32)

        for i in range(n_frames):
            cur = spec[:, i]
            if self._prev_spec is None:
                flux = 1e-5
            else:
                d = cur - self._prev_spec
                flux = float(np.sum(np.maximum(d, 0.0)))
            flux_arr[i] = flux

            # onset detection: local flux peak above threshold
            onset = (flux < self._prev_flux
                     and self._prev_flux > self._left_flux
                     and self._prev_flux > self.in_flux_thresh)
            self._left_flux = self._prev_flux
            self._prev_flux = flux
            self._prev_spec = cur

            f_yin = float(yin_fre[i])
            f_ffp = float(ffp_fre[i])
            v_yin = float(yin_val[i]) if i < len(yin_val) else 1.0
            h = float(hr[i]) if i < len(hr) else 0.0

            candidate = 0.0
            if f_ffp > 0 and _is_similar(f_yin, f_ffp):
                candidate = f_ffp
            elif f_ffp > 0 and v_yin < self.in_thresh:
                candidate = f_ffp
            elif f_yin > 0 and h > self.cut_thresh:
                candidate = f_yin

            if onset:
                self._hold_fre = 0.0
                self._hold_count = 0

            if candidate > 0 and self.low_fre <= candidate <= self.high_fre:
                if self._hold_fre and _is_similar(candidate, self._hold_fre):
                    # smooth update within the held tone
                    self._hold_fre = (self._hold_fre * 0.6 + candidate * 0.4)
                    self._hold_count += 1
                else:
                    self._hold_fre = candidate
                    self._hold_count = 1
            else:
                self._hold_count = max(self._hold_count - 1, 0)
                if self._hold_count == 0:
                    self._hold_fre = 0.0

            out[i] = self._hold_fre if self._hold_count >= 2 else 0.0

        self._flux_arr = flux_arr
        return out

    def get_data_arr(self):
        return self._flux_arr
