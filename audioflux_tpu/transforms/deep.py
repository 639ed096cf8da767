"""Deep / DeepChroma spectrograms — salience-peak pitch-class projection.

Reference ``src/spectrogram_algorithm.c`` DEEP path (:1230-1258 exec,
:1683-1840 __spectrogramObj_deepFilter): per frame, local maxima of the
magnitude spectrum above adaptive thresholds (max>=13, floor max/10 clipped
at 2) are frequency-corrected (hamm peak correction), snapped to the
nearest MIDI tone, and scatter-maxed onto a midi-bin grid; DEEP keeps the
peak's left/right neighbor amplitudes as extra channels, DEEP_CHROMA folds
the midi grid into 12 pitch classes (chroma_cqtFilterBank) and normalizes.

TPU design: the per-frame per-peak C loops become full-matrix masks plus a
per-frame segment-max over midi indices (one-hot matmul); channels come
from the argmax peak per (frame, midi) cell.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.filterbank import scales as _sc
from audioflux_tpu.ops.correct import correct_fn
from audioflux_tpu.ops.frame import cal_time_length, frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.transforms.cqt import chroma_cqt_filter_bank
from audioflux_tpu.transforms.spectrogram import chroma_normalize
from audioflux_tpu.types import (ChromaDataNormalType, SpectralDataType,
                                 WindowType)
from audioflux_tpu.utils.convert import note_to_hz

__all__ = ["DeepSpectrogram", "DeepChromaSpectrogram"]


def _fre_to_midi(f):
    return np.floor(12 * np.log2(np.asarray(f, np.float64) / 440.0)
                    + 69.5).astype(np.int64)


class _DeepBase:
    def __init__(self, num, samplate, radix2_exp, low_fre, high_fre,
                 window_type, slide_length, data_type):
        fft_length = 1 << radix2_exp
        if low_fre is None:
            low_fre = note_to_hz("C1")
        if high_fre is None:
            high_fre = 16000.0
        window_type = WindowType(window_type)
        if window_type > WindowType.HAMM:
            window_type = WindowType.HAMM

        self.samplate = samplate
        self.radix2_exp = radix2_exp
        self.fft_length = fft_length
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.window_type = window_type
        self.slide_length = slide_length if slide_length else fft_length // 4
        self.data_type = SpectralDataType(data_type)
        self.window = get_fft_window(window_type, fft_length)
        self.norm_value = 1.0
        self.chroma_data_normal_type = ChromaDataNormalType.MAX

        # salience thresholds (spectrogram_algorithm.c:568-571)
        self.max_min = 13.0
        self.min_max = 2.0
        self.ratio = 10.0
        self.deep_order = 1  # spectrogram_algorithm.c:563

        det = samplate / float(fft_length)
        self.start_index = int(np.floor(self.low_fre / det))
        self.end_index = min(int(np.ceil(self.high_fre / det)),
                             fft_length // 2)

        # base grid: midi tones starting at log-snapped low_fre (:calDeepBandArr)
        base_log = float(_sc.hz_to_log(self.low_fre, 12))
        self.base_fre = float(_sc.log_to_hz(base_log, 12))
        self.midi_start = int(np.round(12 * np.log2(self.base_fre / 440.0)
                                       + 69))

    def cal_time_length(self, data_length: int) -> int:
        return cal_time_length(data_length, self.fft_length,
                               self.slide_length)

    def set_deep_order(self, deep_order: int):
        """Neighbor-channel layout (spectrogramObj_setDeepOrder,
        spectrogram_algorithm.c:829-834): 1/2 -> 3 channels
        [amp, left1, right1] (1 keeps only the louder side per peak),
        3/4 -> 5 channels adding [left2, right2] (3 keeps the louder
        second neighbor)."""
        if deep_order not in (1, 2, 3, 4):
            raise ValueError(f"deep_order={deep_order} must be in [1,4]")
        self.deep_order = int(deep_order)
        self._spec_run = jax.jit(self._spec_impl)

    def _deep_amps(self, data_arr, base_num):
        """(..., n) -> (amp, left, right) each (..., T, base_num)."""
        x = jnp.asarray(data_arr, jnp.float32)
        frames = frame_signal(x, self.fft_length, self.slide_length)
        mag = jnp.abs(afft.rfft(frames * jnp.asarray(self.window),
                                   axis=-1))  # (..., T, m)
        m = mag.shape[-1]
        s, e = self.start_index, self.end_index

        band = mag[..., s:e + 1]
        mx = jnp.max(band, axis=-1, keepdims=True)
        floor = jnp.maximum(mx / self.ratio, self.min_max)
        frame_ok = mx >= self.max_min

        # local maxima in (max(s,1), min(e, m-2))
        cur = mag
        left = jnp.pad(mag[..., :-1], [(0, 0)] * (mag.ndim - 1) + [(1, 0)])
        right = jnp.pad(mag[..., 1:], [(0, 0)] * (mag.ndim - 1) + [(0, 1)])
        j = np.arange(m)
        in_range = (j >= max(s, 1)) & (j <= min(e, m - 2))
        is_peak = (cur > left) & (cur > right) & in_range \
            & (cur >= floor) & frame_ok

        det, _ = correct_fn(self.window_type)(cur, left, right)
        fre_det = self.samplate / float(self.fft_length)
        correct_fre = (j + det) * fre_det
        # nearest midi tone by Hz distance (_calTone)
        safe_fre = jnp.maximum(correct_fre, 1e-6)
        mexact = 12 * jnp.log2(safe_fre / 440.0) + 69.0
        fi = jnp.floor(mexact)
        fv = jnp.power(2.0, (fi - 69.0) / 12.0) * 440.0
        cv = jnp.power(2.0, (fi + 1.0 - 69.0) / 12.0) * 440.0
        midi = jnp.where(jnp.abs(safe_fre - fv) < jnp.abs(safe_fre - cv),
                         fi, fi + 1.0)
        deep_idx = (midi - self.midi_start).astype(jnp.int32)
        ok = is_peak & (deep_idx >= 0) & (deep_idx < base_num)
        tgt = jnp.where(ok, deep_idx, base_num)  # trash slot

        onehot = jax.nn.one_hot(tgt, base_num + 1, dtype=mag.dtype)
        vals = jnp.where(ok, cur, 0.0)
        scores = onehot[..., :base_num] * vals[..., None]  # (..., T, m, bnum)
        amp = jnp.max(scores, axis=-2)

        # The C deepFilter (spectrogram_algorithm.c:1786-1845) scans
        # salience peaks in spectrum order and writes neighbor channels
        # each time a peak RAISES its slot's running amplitude max; with
        # the one-sided orders (1/3) a later winner on the other side
        # leaves the earlier side's value behind.  Exact model: a peak is
        # "improving" when strictly above the exclusive running max of
        # its slot; each channel keeps the value of the LAST improving
        # peak that wrote it.
        cmax = jax.lax.cummax(scores, axis=scores.ndim - 2)
        prev = jnp.pad(cmax[..., :-1, :],
                       [(0, 0)] * (scores.ndim - 2) + [(1, 0), (0, 0)])
        improving = scores > prev
        m_iota = jnp.arange(m)

        def last_where(mask, val):
            """val (..., T, m) at the LAST spectrum index where mask
            (..., T, m, bnum) holds, per slot; 0 when it never does."""
            pos = jnp.max(jnp.where(mask, m_iota[:, None], -1), axis=-2)
            got = jnp.take_along_axis(val, jnp.maximum(pos, 0), axis=-1)
            return jnp.where(pos >= 0, got, 0.0)

        order = getattr(self, "deep_order", 1)
        if order == 1:  # louder first neighbor only, per improving peak
            chans = [last_where(improving & (left > right)[..., None], left),
                     last_where(improving & (left <= right)[..., None],
                                right)]
        else:
            chans = [last_where(improving, left),
                     last_where(improving, right)]
        if order >= 3:
            # second neighbors: OOB reads stay 0, and a second neighbor
            # louder than its first is zeroed (non-peak-shaped shoulder)
            l2 = jnp.pad(mag[..., :-2],
                         [(0, 0)] * (mag.ndim - 1) + [(2, 0)])
            r2 = jnp.pad(mag[..., 2:],
                         [(0, 0)] * (mag.ndim - 1) + [(0, 2)])
            l2 = jnp.where(l2 > left, 0.0, l2)
            r2 = jnp.where(r2 > right, 0.0, r2)
            if order == 3:  # louder second neighbor only
                chans += [last_where(improving & (l2 > r2)[..., None], l2),
                          last_where(improving & (l2 <= r2)[..., None], r2)]
            else:
                chans += [last_where(improving, l2),
                          last_where(improving, r2)]
        return amp, chans


class DeepSpectrogram(_DeepBase):
    """DEEP scale (``python/audioflux/spectrogram.py:2655`` `Deep`):
    (..., 3, num, time) channels [peak amp, left neighbor, right neighbor]."""

    def __init__(self, num=84, samplate=32000, radix2_exp=12,
                 low_fre=None, high_fre=None,
                 window_type=WindowType.HAMM, slide_length=None,
                 data_type=SpectralDataType.POWER):
        super().__init__(num, samplate, radix2_exp, low_fre, high_fre,
                         window_type, slide_length, data_type)
        self.num = num
        self.base_num = num
        logs = np.arange(num) + float(_sc.hz_to_log(self.low_fre, 12))
        self.fre_band_arr = np.asarray(_sc.log_to_hz(logs, 12), np.float32)
        det = samplate / float(self.fft_length)
        self.bin_band_arr = np.round(self.fre_band_arr / det).astype(np.int32)
        # whole frame->peak->tone pipeline under one jit (eager per-op
        # dispatch over the axon tunnel costs more than the math)
        self._spec_run = jax.jit(self._spec_impl)

    def get_fre_band_arr(self):
        return self.fre_band_arr

    def spectrogram(self, data_arr):
        return self._spec_run(jnp.asarray(data_arr, jnp.float32))

    def _spec_impl(self, data_arr):
        amp, chans = self._deep_amps(data_arr, self.base_num)
        out = jnp.stack([amp] + chans, axis=-3)  # (..., 3|5, T, num)
        if self.data_type == SpectralDataType.POWER:
            out = out * out
            if self.norm_value != 1:
                out = jnp.power(out, self.norm_value)
        elif self.norm_value != 1:
            out = jnp.power(out, self.norm_value)
        return jnp.swapaxes(out, -1, -2)  # (..., 3, num, T)


class DeepChromaSpectrogram(_DeepBase):
    """DEEP_CHROMA scale (``python/audioflux/spectrogram.py:2739``
    `DeepChroma`): chroma fold of the deep amplitude grid."""

    def __init__(self, samplate=32000, radix2_exp=12, num=12,
                 low_fre=None, high_fre=None,
                 window_type=WindowType.HAMM, slide_length=None,
                 data_type=SpectralDataType.POWER):
        super().__init__(num, samplate, radix2_exp, low_fre, high_fre,
                         window_type, slide_length, data_type)
        if num < 12 or num % 12 != 0:
            num = 12
        self.num = num
        lo = float(_sc.hz_to_log(self.low_fre, 12))
        hi = float(_sc.hz_to_log(self.high_fre, 12))
        self.base_num = int(hi - lo) + 1
        self._fold = chroma_cqt_filter_bank(num, self.base_num, 12,
                                            self.base_fre)
        self._spec_run = jax.jit(self._spec_impl)

    def spectrogram(self, data_arr):
        return self._spec_run(jnp.asarray(data_arr, jnp.float32))

    def _spec_impl(self, data_arr):
        amp, _ = self._deep_amps(data_arr, self.base_num)
        if self.data_type == SpectralDataType.POWER:
            amp = amp * amp
            if self.norm_value != 1:
                amp = jnp.power(amp, self.norm_value)
        out = jnp.einsum("...tb,cb->...tc", amp, jnp.asarray(self._fold),
                         precision=jax.lax.Precision.HIGHEST)
        if self.data_type == SpectralDataType.MAG and self.norm_value != 1:
            out = jnp.power(out, self.norm_value)
        out = chroma_normalize(out, self.chroma_data_normal_type)
        return jnp.swapaxes(out, -1, -2)
