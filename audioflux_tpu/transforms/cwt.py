"""Continuous wavelet transform — frequency-domain mother wavelets.

Reference ``src/cwt_algorithm.c`` + ``src/filterbank/cwt_filterBank.c``:
symmetric-pad the (2^radix2_exp)-sample signal, FFT once, multiply by the
num x fftLength real frequency-domain wavelet bank (morse/morlet/bump/paul/
dog/mexican/hermit/ricker, cwt_filterBank.c:19-66 + generators), then one
IFFT per scale. The reference's per-scale IFFT loop (cwt_algorithm.c:443-456)
is a single batched ``afft.ifft`` over the (..., num, fftLength) tile.

Rows are computed scale-ordered (highest band first, cwt_filterBank.c sArr
reversal) and flipped to ascending frequency on output like the Python
wrapper (python/audioflux/cwt.py:277).
"""

from __future__ import annotations

import math

import jax
from audioflux_tpu.ops.backend import on_tpu as _on_tpu
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.filterbank import scales as _sc
from audioflux_tpu.filterbank.auditory import _revise_fre, _scale_funcs, _linspace_f32
from audioflux_tpu.types import (SpectralFilterBankScaleType,
                                 WaveletContinueType)
from audioflux_tpu.utils.convert import note_to_hz

__all__ = ["CWT", "cwt_filter_bank"]

_DEFAULT_GB = {
    WaveletContinueType.MORSE: (3.0, 20.0),
    WaveletContinueType.MORLET: (6.0, 2.0),
    WaveletContinueType.BUMP: (5.0, 0.6),
    WaveletContinueType.PAUL: (4.0, 20.0),
    WaveletContinueType.DOG: (2.0, 2.0),
    WaveletContinueType.MEXICAN: (3.0, 2.0),
    WaveletContinueType.HERMIT: (5.0, 2.0),
    WaveletContinueType.RICKER: (4.0, 20.0),
}


def _center_fre(wavelet_type, gamma):
    W = WaveletContinueType
    if wavelet_type == W.MORSE:
        beta = None  # filled by caller
        raise AssertionError("morse handled separately")
    if wavelet_type in (W.MORLET, W.BUMP, W.RICKER):
        return gamma
    if wavelet_type == W.PAUL:
        return gamma + 0.5
    if wavelet_type == W.DOG:
        return math.sqrt(gamma + 0.5)
    if wavelet_type == W.MEXICAN:
        return math.sqrt(2 + 0.5)
    if wavelet_type == W.HERMIT:
        return gamma + 1.0


def _wavelet_psi(x: np.ndarray, wavelet_type, gamma: float, beta: float,
                 cf: float) -> np.ndarray:
    """Frequency response psi(x) for x = scale*omega (> 0 kept; <=0 zeroed).

    Formulas mirror __cwt_*FilterBank (cwt_filterBank.c generators).
    """
    W = WaveletContinueType
    pos = x > 0
    xp = np.where(pos, x, 1.0)
    if wavelet_type == W.MORSE:
        factor = np.exp(-beta * np.log(cf) + cf ** gamma)
        v = 2.0 * factor * np.exp(beta * np.log(xp) - xp ** gamma)
    elif wavelet_type == W.MORLET:
        v = 2.0 * np.exp(-((xp - cf) ** 2) / beta)
    elif wavelet_type == W.BUMP:
        sigma = beta
        u = (x - cf) / sigma
        inside = np.abs(u) < 1 - 1e-6
        uu = np.where(inside, u, 0.0)
        v = np.where(inside, 2.0 * np.e * np.exp(-1.0 / (1.0 - uu * uu)), 0.0)
        return np.nan_to_num(v, nan=0.0).astype(np.float32)
    elif wavelet_type == W.PAUL:
        p = int(round(gamma))
        fact = 1.0
        for i in range(2, 2 * p):
            fact *= i
        factor = (2.0 ** p) / math.sqrt(p * fact)
        v = factor * xp ** gamma * np.exp(-xp)
    elif wavelet_type in (W.DOG, W.MEXICAN):
        g = 2.0 if wavelet_type == W.MEXICAN else gamma
        p = int(round(g))
        factor = -1.0 / math.sqrt(math.gamma(p + 0.5))
        if (p // 2) % 2 == 1:
            factor = -factor
        v = factor * xp ** g * np.exp(-xp * xp / beta)
    elif wavelet_type == W.HERMIT:
        factor = 2.0 / math.sqrt(gamma) * math.pi ** -0.25
        d = xp - gamma
        v = factor * d * (1 + d) * np.exp(-d * d / beta)
    elif wavelet_type == W.RICKER:
        factor = 2.0 / math.sqrt(math.pi)
        v = factor * xp * xp / gamma ** 3 * np.exp(-xp * xp / gamma ** 2)
    else:
        raise ValueError(f"unsupported wavelet {wavelet_type!r}")
    return np.where(pos, v, 0.0).astype(np.float32)


def cwt_filter_bank(num, data_length, samplate, pad_length, wavelet_type,
                    gamma, beta, scale_type, low_fre, high_fre,
                    bin_per_octave=12):
    """(bank (num, wLength) float32 scale-ordered high-fre-first,
    fre_band (num,) ascending, bin_band (num,)).

    Mirrors cwt_filterBank (cwt_filterBank.c:cwt_filterBank): non-edge band
    revision, omega grid, scale array cf/(f/sr*2pi), wavelet response.
    """
    W = WaveletContinueType(wavelet_type)
    scale_type = SpectralFilterBankScaleType(scale_type)
    w_length = data_length + 2 * pad_length

    low_fre, high_fre, ref = _revise_fre(
        scale_type, num, low_fre, high_fre, bin_per_octave, samplate,
        data_length, is_edge=False)
    if scale_type == SpectralFilterBankScaleType.OCTAVE:
        ref_bpo = (bin_per_octave
                   if (bin_per_octave and 4 <= bin_per_octave <= 48) else 12)
    else:
        ref_bpo = ref
    func1, func2 = _scale_funcs(scale_type, ref_bpo)
    lo = np.float32(func1(np.float32(low_fre)))
    hi = np.float32(func1(np.float32(high_fre)))
    f_arr = np.asarray(func2(_linspace_f32(lo, hi, num + 2)),
                       dtype=np.float32)

    if W == WaveletContinueType.MORSE:
        cf = float(np.exp(1.0 / gamma * (np.log(beta) - np.log(gamma))))
    else:
        cf = _center_fre(W, gamma)

    # omega grid (angular, wrapped negative upper half)
    w = np.zeros(w_length, np.float64)
    half = w_length // 2
    w[:half + 1] = np.arange(half + 1) * 2 * np.pi / w_length
    w[half + 1:] = -w[1:w_length - half][::-1]

    # scales: descending band frequency (cwt_filterBank.c sArr loop)
    f_used = np.maximum(f_arr[1:num + 1], 1e-6)[::-1]
    s_arr = cf / (f_used.astype(np.float64) / samplate * 2 * np.pi)

    x = s_arr[:, None] * w[None, :]
    bank = _wavelet_psi(x, W, float(gamma), float(beta), cf)

    fre_band = f_arr[1:num + 1]
    bin_band = np.round(data_length * fre_band.astype(np.float64)
                        / samplate).astype(np.int64)
    return bank, fre_band, bin_band


def _cwt_conv_body(x, bank, *, det: bool, pad_length: int, data_length: int,
                   row_h=None, force_kernel=None, interpret: bool = False):
    """The CWT/PWT filterbank convolution: symmetric pad -> FFT -> bank
    multiply -> per-band IFFT -> un-pad (times ``i`` when ``det``).

    Module-level (not a method) so the band-sharded shard_map twins in
    ``parallel/sharded_full.py`` can run it per band shard with their own
    static ``row_h`` (the fused-kernel stage-1 support counts must be
    uniform across shards — shard_map traces one program).
    ``force_kernel``: None = auto (TPU + pallas_cwt.supports); True/False
    pins the tier (tests / shard_map bodies resolve it at build time).
    """
    p = pad_length
    if p:
        pad = [(0, 0)] * (x.ndim - 1) + [(p, p)]
        x = jnp.pad(x, pad, mode="symmetric")
    F = afft.fft(x, axis=-1)  # (..., L)

    from audioflux_tpu.ops.pallas_cwt import cwt_ifft_bank, supports
    w_len = x.shape[-1]
    use_k = force_kernel
    if use_k is None:
        use_k = _on_tpu() and supports(w_len, p, data_length)
    if use_k:
        # fused bank-multiply + four-step matmul IFFT in VMEM
        # (ops/pallas_cwt.py): one HBM pass instead of XLA's log2(N)
        # fft sweeps over the (num, N) product; bf16x3 MXU accuracy
        # ~1e-5 relative (inside the golden tolerance class)
        lead = F.shape[:-1]
        out = cwt_ifft_bank(F.reshape((-1, w_len)), jnp.asarray(bank),
                            pad=p, length=data_length, det=det,
                            row_h=row_h, interpret=interpret)
        return out.reshape(lead + out.shape[1:])

    B = jnp.asarray(bank)
    prod = B * F[..., None, :]
    if det:
        prod = prod * 1j
    out = afft.ifft(prod, axis=-1)
    if p:
        out = out[..., p:p + data_length]
    return out  # rows already ascending (bank pre-flipped at build)


class CWT:
    """API mirrors ``python/audioflux/cwt.py:128-350``.

    ``cwt(x)``: x must be exactly ``2**radix2_exp`` samples; returns
    complex64 (..., num, data_length), rows ascending in frequency.
    """

    def __init__(self, num=84, radix2_exp=12, samplate=32000,
                 low_fre=None, high_fre=None, bin_per_octave=12,
                 wavelet_type=WaveletContinueType.MORSE,
                 scale_type=SpectralFilterBankScaleType.OCTAVE,
                 gamma=None, beta=None, is_padding=True):
        S = SpectralFilterBankScaleType
        scale_type = S(scale_type)
        wavelet_type = WaveletContinueType(wavelet_type)
        if scale_type > S.LOG:
            raise ValueError(f"CWT does not support scale {scale_type.name}")
        data_length = 1 << radix2_exp
        if not 2 <= num <= data_length // 2 + 1:
            raise ValueError(f"num={num} out of range")

        log_like = scale_type in (S.OCTAVE, S.LOG)
        if low_fre is None:
            low_fre = note_to_hz("C1") if log_like else 0.0  # 32.703
        if high_fre is None:
            high_fre = samplate / 2.0
        if log_like and low_fre < round(note_to_hz("C1"), 3):
            raise ValueError(f"{scale_type.name} low_fre must be >= 32.703")

        dg, db = _DEFAULT_GB[wavelet_type]
        gamma = dg if gamma is None or gamma <= 0 else float(gamma)
        beta = db if beta is None or beta <= 0 else float(beta)
        if wavelet_type == WaveletContinueType.DOG and int(round(gamma)) % 2:
            raise ValueError("DOG gamma must round to an even integer")

        # ctor-level edge revision (cwt_algorithm.c:183-207, isEdge=1)
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
        self.fft_length = data_length  # python wrapper naming
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.bin_per_octave = bin_per_octave
        self.wavelet_type = wavelet_type
        self.scale_type = scale_type
        self.gamma = gamma
        self.beta = beta
        self.is_padding = bool(is_padding)

        if self.is_padding:
            self.pad_length = (data_length // 2 if data_length <= 1e5
                               else int(np.ceil(np.log2(data_length))))
        else:
            self.pad_length = 0

        bank, fre, bins = cwt_filter_bank(
            num, data_length, samplate, self.pad_length, wavelet_type,
            gamma, beta, scale_type, self.low_fre, self.high_fre,
            bin_per_octave)
        # store rows ascending in frequency: folding the wrapper's output
        # flip (cwt.py:277) into the constant bank saves a full copy of
        # the (num, L) complex matrix per call
        self._bank = np.ascontiguousarray(bank[::-1])
        self.fre_band_arr = fre
        self.bin_band_arr = bins
        self._det_bank = None
        self._row_h = self._det_row_h = None
        w_len = data_length + 2 * self.pad_length
        if w_len & (w_len - 1) == 0:
            from audioflux_tpu.ops.pallas_cwt import band_row_counts
            # static stage-1 support rows for the fused kernel (exact:
            # only f32-zero bank rows are dropped)
            self._row_h = band_row_counts(self._bank, w_len)
        # whole filterbank convolution under one jit (eager per-op
        # dispatch over the axon tunnel costs more than the transform)
        self._cwt_run = jax.jit(self._run, static_argnames=("det",))

    def get_fre_band_arr(self):
        return self.fre_band_arr

    def get_bin_band_arr(self):
        return self.bin_band_arr

    def enable_det(self, flag: bool = True):
        """Build the derivative bank (bank * i*omega) for synchrosqueezing
        (cwt_algorithm.c:cwtObj_enableDet)."""
        if flag and self._det_bank is None:
            L = self._bank.shape[1]
            w = np.zeros(L, np.float64)
            half = L // 2
            w[:half + 1] = np.arange(half + 1) * 2 * np.pi / L
            w[half + 1:] = -w[1:L - half][::-1]
            self._det_bank = (self._bank * w[None, :]).astype(np.float32)
            if L & (L - 1) == 0:
                from audioflux_tpu.ops.pallas_cwt import band_row_counts
                self._det_row_h = band_row_counts(self._det_bank, L)

    def _run(self, data_arr, bank, det: bool):
        x = jnp.asarray(data_arr, jnp.float32)
        if x.shape[-1] != self.data_length:
            raise ValueError(
                f"data length must be exactly {self.data_length}")
        return _cwt_conv_body(x, bank, det=det, pad_length=self.pad_length,
                              data_length=self.data_length,
                              row_h=(self._det_row_h if det
                                     else self._row_h))

    def cwt(self, data_arr):
        return self._cwt_run(data_arr, self._bank, det=False)

    def cwt_det(self, data_arr):
        """CWT with the derivative bank (i*omega*psi) — instantaneous
        frequency numerator for WSST."""
        self.enable_det(True)
        return self._cwt_run(data_arr, self._det_bank, det=True)

    def ccwt(self, data_arr):
        """Continuous CWT over long signals (reference cwt.py:280-320):
        run the fft-length CWT every fft/2 samples and splice the middle
        halves (the first window keeps its head, the last its tail).
        The length must be a multiple of fft_length//2."""
        data_arr = jnp.asarray(data_arr, jnp.float32)
        data_len = data_arr.shape[-1]
        win_len = self.fft_length // 4
        step = win_len * 2
        win_count = (data_len // step) - 1
        if win_count < 1:
            raise ValueError(
                f"data length {data_len} too short for ccwt "
                f"(needs >= {2 * step})")
        parts = []
        for i in range(win_count):
            seg = data_arr[..., i * step:i * step + self.fft_length]
            if seg.shape[-1] != self.fft_length:
                break
            spec = self.cwt(seg)
            start = 0 if i == 0 else win_len
            end = (self.fft_length if i == win_count - 1
                   else win_len * 3)
            parts.append(spec[..., start:end])
        return jnp.concatenate(parts, axis=-1)

    def y_coords(self):
        return self.fre_band_arr

    def x_coords(self):
        return np.arange(self.data_length) / self.samplate
