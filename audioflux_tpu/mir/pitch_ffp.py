"""FFP pitch — FFT-peak pitch with candidate filtering and resolution.

Reference ``src/mir/_pitch_ffp.c`` + ``src/mir/_queue.c``: STFT peaks run
through the salience filter chain (the same height/near/dB filters as
harmonic_algorithm.c) and the per-frame candidate set is resolved by a
strategy engine. This implementation reuses the ported Harmonic filter
chain and resolves candidates with the fully-ported trist rule table
(mir/_trist.py); the reference's six-strategy _queue engine
(standard/cut/fast/direct/slide/weak, 7.7k LoC of tracking heuristics) is
NOT yet ported — results agree on harmonic material but can differ on the
reference's special-cased corner signals. See README "known deviations".
"""

from __future__ import annotations

import numpy as np

from audioflux_tpu.mir._trist import trist
from audioflux_tpu.mir.harmonic import Harmonic
from audioflux_tpu.ops.correct import correct_fn
from audioflux_tpu.types import WindowType

__all__ = ["PitchFFP"]


class PitchFFP:
    """API mirrors ``python/audioflux/mir/pitch_ffp.py``."""

    def __init__(self, samplate=32000, low_fre=32.0, high_fre=2000.0,
                 radix2_exp=12, slide_length=1024,
                 window_type=WindowType.HAMM):
        self.samplate = samplate
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.slide_length = slide_length if slide_length else self.fft_length // 4
        self.window_type = WindowType(window_type)
        # peak extraction + filter chain shared with Harmonic (identical in C)
        self._harm = Harmonic(samplate=samplate, low_fre=27.0,
                              high_fre=min(4000.0, samplate / 2 - 1),
                              radix2_exp=radix2_exp,
                              window_type=self.window_type,
                              slide_length=self.slide_length)

    def cal_time_length(self, data_length: int) -> int:
        return self._harm.cal_time_length(data_length)

    def pitch(self, data_arr):
        """(n,) -> (fre_arr, db_arr) per frame."""
        self._harm.exec(data_arr)
        peaks = self._harm._peaks
        T = len(peaks)
        fre_out = np.zeros(T, np.float32)
        db_out = np.full(T, -120.0, np.float32)
        for i, plist in enumerate(peaks):
            if not plist:
                continue
            # dB-descending candidates (trist convention)
            plist = sorted(plist, key=lambda p: -p[0])
            n = len(plist)
            pad = max(8, n)
            corr = np.zeros(pad)
            db = np.full(pad, -120.0)
            h = np.zeros(pad)
            midi = np.zeros(pad, np.int64)
            P = self._harm._power[i]
            cf = correct_fn(self.window_type)
            for j, (d, f, hh, idx) in enumerate(plist):
                # sub-bin frequency correction (FFP applies the window
                # correction; harmonic's chain records raw-bin freqs)
                k = int(idx)
                if 0 < k < len(P) - 1:
                    mag = np.sqrt(P[k - 1:k + 2])
                    scale, _ = cf(float(mag[1]), float(mag[0]),
                                  float(mag[2]))
                    f = ((k + self._harm.min_index + float(scale))
                         / self.fft_length * self.samplate)
                corr[j], db[j], h[j] = f, d, hh
                midi[j] = int(round(12 * np.log2(max(f, 1e-12) / 440) + 69))
            db_out[i] = db[0]
            flag, fre = trist(corr, db, h, midi, corr, db, h, midi,
                              min(n, 3), max(n - 3, 0))
            if flag:
                fre_out[i] = fre
            elif self.low_fre <= corr[0] <= self.high_fre:
                fre_out[i] = corr[0]
        return fre_out, db_out
