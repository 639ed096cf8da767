"""Pitch estimation family: NCF, CEP, HPS, LHS, PEF.

Reference ``src/mir/_pitch_{ncf,cep,hps,lhs,pef}.c``. All five share the
frame layout ``x[i*slide : i*slide+fft]``, ``T=(n-fft)//slide+1`` and an
arg-max pick over a lag/bin range (util_peakPick with num=1); each one's
per-frame FFT loop runs as a single batched rfft here.

- NCF: normalized FFT autocorrelation over lag range, fre = sr/lag
  (_pitch_ncf.c:calCorr/dealResult).
- CEP: real cepstrum of log power, argmax quefrency (_pitch_cep.c).
- HPS: 32768-point spectrum, product of |F| over 5 harmonics (_pitch_hps.c).
- LHS: same grid, sum of log|F| over harmonics (_pitch_lhs.c).
- PEF: log-frequency-resampled power spectrum correlated with a comb-like
  1/(gamma-cos) filter; peak maps through the log grid (_pitch_pef.c).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.ops.frame import frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.types import WindowType

__all__ = ["PitchNCF", "PitchCEP", "PitchHPS", "PitchLHS", "PitchPEF"]


def _round_pow2(n: int) -> int:
    lo = 1
    while lo * 2 <= n:
        lo *= 2
    return lo * 2 if (n - lo) > (lo * 2 - n) else lo


class _PitchBase:
    def __init__(self, samplate, low_fre, high_fre, radix2_exp, slide_length,
                 default_lo, default_hi):
        if not (high_fre > low_fre and high_fre < samplate / 2):
            low_fre, high_fre = default_lo, default_hi
        self.samplate = samplate
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.slide_length = (slide_length if slide_length
                             else self.fft_length // 4)

    def cal_time_length(self, data_length: int) -> int:
        if data_length < self.fft_length:
            return 0
        return (data_length - self.fft_length) // self.slide_length + 1


class PitchNCF(_PitchBase):
    """Normalized cross-correlation pitch
    (``python/audioflux/mir/pitch_ncf.py``)."""

    def __init__(self, samplate=32000, low_fre=32.0, high_fre=2000.0,
                 radix2_exp=12, slide_length=None,
                 window_type=WindowType.RECT):
        super().__init__(samplate, low_fre, high_fre, radix2_exp,
                         slide_length, 32.0, 2000.0)
        self.window_type = WindowType(window_type)
        self.window = get_fft_window(self.window_type, self.fft_length)
        self.min_index = int(np.round(samplate / self.high_fre))
        self.max_index = int(np.round(samplate / self.low_fre))

    def pitch(self, data_arr):
        x = jnp.asarray(data_arr, jnp.float32)
        L2 = self.fft_length * 2
        frames = frame_signal(x, self.fft_length, self.slide_length)
        if self.window_type != WindowType.RECT:
            frames = frames * jnp.asarray(self.window)
        F = afft.fft(frames, n=L2, axis=-1)
        acf = jnp.real(afft.ifft(jnp.abs(F) ** 2, axis=-1))
        acf = acf / np.sqrt(L2)
        rms = jnp.sqrt(acf[..., :1])
        lags = acf[..., self.min_index:self.max_index + 1] / rms
        idx = jnp.argmax(lags, axis=-1) + self.min_index
        return self.samplate / idx.astype(jnp.float32)


class PitchCEP(_PitchBase):
    """Cepstral pitch (``python/audioflux/mir/pitch_cep.py``)."""

    def __init__(self, samplate=32000, low_fre=32.0, high_fre=2000.0,
                 radix2_exp=12, slide_length=None,
                 window_type=WindowType.HAMM):
        super().__init__(samplate, low_fre, high_fre, radix2_exp,
                         slide_length, 32.0, 2000.0)
        self.window_type = WindowType(window_type)
        self.window = get_fft_window(self.window_type, self.fft_length)
        self.min_index = int(np.round(samplate / self.high_fre))
        self.max_index = int(np.round(samplate / self.low_fre))

    def pitch(self, data_arr):
        x = jnp.asarray(data_arr, jnp.float32)
        L2 = self.fft_length * 2
        frames = frame_signal(x, self.fft_length, self.slide_length)
        if self.window_type != WindowType.RECT:
            frames = frames * jnp.asarray(self.window)
        # exact fft tier: log|F|^2 amplifies the four-step kernel's
        # ~1e-5 error on near-zero bins into cepstral argmax flips
        # (measured 8.5% of frames flipped >100 Hz on a clean tone)
        F = afft.fft(frames, n=L2, axis=-1, exact=True)
        ceps = jnp.real(afft.ifft(jnp.log(jnp.abs(F) ** 2), axis=-1,
                                  exact=True))
        band = ceps[..., self.min_index:self.max_index + 1]
        idx = jnp.argmax(band, axis=-1) + self.min_index
        return self.samplate / (idx + 1).astype(jnp.float32)


class _HarmonicGrid(_PitchBase):
    def __init__(self, samplate, low_fre, high_fre, radix2_exp, slide_length,
                 window_type, harmonic_count):
        super().__init__(samplate, low_fre, high_fre, radix2_exp,
                         slide_length, 32.0, 2000.0)
        self.window_type = WindowType(window_type)
        self.window = get_fft_window(self.window_type, self.fft_length)
        self.interp_fft_length = _round_pow2(samplate)
        self.min_index = int(np.ceil(self.low_fre))
        self.max_index = int(np.floor(self.high_fre))
        hc = int(harmonic_count) if harmonic_count else 5
        k = samplate // (self.max_index + 1)
        if hc > k:
            hc = max(k, 1)
        self.harmonic_count = hc
        # harmonic gather indices (j*(k+1) for j in 0..max)
        j = np.arange(self.max_index + 1)
        self._hidx = j[:, None] * (np.arange(hc)[None, :] + 1)

    def _mag(self, data_arr):
        x = jnp.asarray(data_arr, jnp.float32)
        frames = frame_signal(x, self.fft_length, self.slide_length)
        if self.window_type != WindowType.RECT:
            frames = frames * jnp.asarray(self.window)
        F = afft.fft(frames, n=self.interp_fft_length, axis=-1)
        return jnp.abs(F)


class PitchHPS(_HarmonicGrid):
    """Harmonic product spectrum (``python/audioflux/mir/pitch_hps.py``)."""

    def __init__(self, samplate=32000, low_fre=32.0, high_fre=2000.0,
                 radix2_exp=12, slide_length=None,
                 harmonic_count=5, window_type=WindowType.HAMM):
        super().__init__(samplate, low_fre, high_fre, radix2_exp,
                         slide_length, window_type, harmonic_count)

    def pitch(self, data_arr):
        mag = self._mag(data_arr)
        hps = jnp.prod(mag[..., jnp.asarray(self._hidx)], axis=-1)
        band = hps[..., self.min_index:self.max_index + 1]
        idx = jnp.argmax(band, axis=-1) + self.min_index
        return ((idx + 1).astype(jnp.float32)
                * (self.samplate / self.interp_fft_length))


class PitchLHS(_HarmonicGrid):
    """Log-harmonic summation (``python/audioflux/mir/pitch_lhs.py``)."""

    def __init__(self, samplate=32000, low_fre=32.0, high_fre=2000.0,
                 radix2_exp=12, slide_length=None,
                 harmonic_count=5, window_type=WindowType.HAMM):
        super().__init__(samplate, low_fre, high_fre, radix2_exp,
                         slide_length, window_type, harmonic_count)

    def pitch(self, data_arr):
        db = jnp.log(self._mag(data_arr))
        lhs = jnp.sum(db[..., jnp.asarray(self._hidx)], axis=-1)
        band = lhs[..., self.min_index:self.max_index + 1]
        idx = jnp.argmax(band, axis=-1) + self.min_index
        return ((idx + 1).astype(jnp.float32)
                * (self.samplate / self.interp_fft_length))


class PitchPEF(_PitchBase):
    """Pseudo-energy-filter pitch (``python/audioflux/mir/pitch_pef.py``)."""

    def __init__(self, samplate=32000, low_fre=32.0, high_fre=2000.0,
                 cut_fre=4000.0, radix2_exp=12, slide_length=None,
                 window_type=WindowType.HAMM,
                 alpha=10.0, beta=0.5, gamma=1.8):
        super().__init__(samplate, low_fre, high_fre, radix2_exp,
                         slide_length, 32.0, 2000.0)
        if not cut_fre > self.high_fre:
            cut_fre = self.high_fre
        self.cut_fre = float(cut_fre)
        self.window_type = WindowType(window_type)
        self.window = get_fft_window(self.window_type, self.fft_length)
        self.alpha, self.beta, self.gamma = float(alpha), float(beta), float(gamma)

        N = self.fft_length
        sr = samplate
        self._linear_fre = np.linspace(0, sr / 2, N + 1).astype(np.float64)
        fre1 = self.cut_fre if sr / 2 > self.cut_fre else sr / 2 - 1
        # start is the literal log10 value 1 -> 10 Hz (_pitch_pef.c:initData)
        self._log_fre = np.logspace(1.0, np.float32(np.log10(np.float32(fre1))),
                                    2 * N).astype(np.float64)

        # min/max index on the log grid (_pitch_pef.c:initData nearest pick)
        lf = self._log_fre
        self.min_index = -1
        self.max_index = 0
        for i in range(1, 2 * N):
            if self.high_fre < lf[i]:
                self.max_index = (i if lf[i] - self.high_fre
                                  < self.high_fre - lf[i - 1] else i - 1)
                break
            if self.min_index != -1:
                continue
            if self.low_fre < lf[i]:
                self.min_index = (i if lf[i] - self.low_fre
                                  < self.low_fre - lf[i - 1] else i - 1)

        bw = np.zeros(2 * N)
        bw[1:2 * N - 1] = (lf[2:] - lf[:-2]) / (2 * 2 * N)
        bw[0] = bw[1]
        bw[-1] = bw[-2]
        self._band_width = bw.astype(np.float32)

        self._cal_filter()

    def _cal_filter(self):
        """Comb estimate filter from alpha/beta/gamma
        (_pitch_pef.c calEstimateFilter)."""
        N = self.fft_length
        q = np.logspace(np.log10(self.beta), np.log10(self.alpha + self.beta),
                        N)
        h = 1.0 / (self.gamma - np.cos(2 * np.pi * q))
        pad_num = int((q < 1).sum())
        d = np.empty(N + 1)
        d[0] = q[0]
        d[1:N] = (q[:-1] + q[1:]) / 2
        d[N] = q[N - 1]
        d = np.diff(d)
        det = (d * h).sum() / d.sum()
        self._filter = (h - det).astype(np.float32)
        self._pad_num = pad_num
        self.xcorr_fft_length = 1 << (self.radix2_exp
                                      + (3 if pad_num else 2))

    def set_filter_params(self, alpha: float, beta: float, gamma: float):
        """Re-derive the comb filter (pitchPEFObj_setFilterParams):
        alpha > 0, 0 <= beta <= 1, gamma > 1."""
        if alpha <= 0:
            raise ValueError("`alpha` must be greater than 0.")
        if beta < 0 or beta > 1:
            raise ValueError("`beta` must be between 0 and 1.")
        if gamma <= 1:
            raise ValueError("`gamma` must be greater than 1.")
        self.alpha, self.beta = float(alpha), float(beta)
        self.gamma = float(gamma)
        self._cal_filter()

    def pitch(self, data_arr):
        x = jnp.asarray(data_arr, jnp.float32)
        N = self.fft_length
        frames = frame_signal(x, N, self.slide_length)
        frames = frames * jnp.asarray(self.window)
        F = afft.fft(frames, n=2 * N, axis=-1)
        power = (jnp.real(F) ** 2 + jnp.imag(F) ** 2)[..., :N + 1]

        # linear->log frequency resample (vinterp_linear)
        lf = self._log_fre
        linf = self._linear_fre
        pos = np.searchsorted(linf, lf, side="left") - 1
        pos = np.clip(pos, 0, N - 1)
        x1 = linf[pos]
        x2 = linf[pos + 1]
        w = ((lf - x1) / (x2 - x1)).astype(np.float32)
        p1 = power[..., pos]
        p2 = power[..., pos + 1]
        interp = p1 + jnp.asarray(w) * (p2 - p1)
        interp = interp * jnp.asarray(self._band_width)

        X = self.xcorr_fft_length
        buf = jnp.pad(interp, [(0, 0)] * (interp.ndim - 1)
                      + [(self._pad_num, X - self._pad_num - 2 * N)])
        Ff = afft.fft(jnp.asarray(np.pad(self._filter,
                                            (0, X - N))).astype(jnp.float32))
        Fb = afft.fft(buf, axis=-1)
        xc = jnp.real(afft.ifft(Fb * jnp.conj(Ff), axis=-1))

        # lag pick (dealResult, len=maxIndex+1): the winning index IS the
        # lag, mapped through the log grid
        band = xc[..., self.min_index:self.max_index + 1]
        lag = jnp.argmax(band, axis=-1) + self.min_index
        return jnp.asarray(self._log_fre, jnp.float32)[lag]
