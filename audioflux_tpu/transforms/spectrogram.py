"""Filterbank spectrogram hub (the reference's ``spectrogram_algorithm.c``).

Pipeline, fully fused under one jit:

    frame -> window -> rfft -> power/mag -> filterbank einsum (MXU)
          -> [chroma normalize | double-gemm log-chroma] -> (num, time)

plus the cepstral family (MFCC/BFCC/GTCC/LFCC/xxcc) as log/cbrt -> DCT-II
(ortho) matmuls. Covers scales LINEAR/LINSPACE/MEL/BARK/ERB/OCTAVE/LOG/
CHROMA/LOG_CHROMA (DEEP/DEEP_CHROMA live in ``deep.py``).

Reference exec path: ``__spectrogramObj_spectrogram``
(spectrogram_algorithm.c:864-1390); ctor semantics :330-570.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.filterbank import scales as _sc
from audioflux_tpu.filterbank.auditory import auditory_filter_bank
from audioflux_tpu.filterbank.chroma import chroma_stft_filter_bank, chroma_fold_filter_bank
from audioflux_tpu.ops.frame import cal_time_length, frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.types import (
    ChromaDataNormalType,
    CepstralRectifyType,
    SpectralDataType,
    SpectralFilterBankNormalType,
    SpectralFilterBankScaleType,
    SpectralFilterBankStyleType,
    WindowType,
)
from audioflux_tpu.utils.convert import note_to_hz

__all__ = [
    "Spectrogram", "MelSpectrogram", "BarkSpectrogram", "ErbSpectrogram",
    "chroma_normalize", "dct_matrix", "xxcc_from_spec",
]

_HIGHEST = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("fft_length", "slide_length",
                                   "use_kernel", "interpret"))
def _small_t_mel_cc(x, window, fb, dct, *, fft_length, slide_length,
                    use_kernel=None, interpret=False):
    """Short-clip (T < 8) mel+cc: batched fft + two MXU einsums.

    At T=1 the frames ARE the clips, so there is no framing relayout at
    all — the whole batch is one matrix pipeline.  On TPU the fft runs
    as the four-step Pallas kernel and the filterbank is contracted
    directly in the kernel's T-layout bin order (``fb`` must then be the
    ``pallas_fft.permute_bins_t`` matrix; the caller owns that choice
    because the permutation is a host-side constant)."""
    from audioflux_tpu.ops import pallas_fft as pfft

    frames = frame_signal(x, fft_length, slide_length)
    if use_kernel is None:
        use_kernel = pfft.supports(fft_length)
    if use_kernel:
        zr, zi = pfft.fft4_fwd(frames * window, interpret=interpret)
        P = (zr * zr + zi * zi).reshape(zr.shape[:-2] + (fft_length,))
    else:
        S = afft.rfft(frames * window, axis=-1)
        re, im = jnp.real(S), jnp.imag(S)
        P = re * re + im * im
    mel = jnp.einsum("...tf,nf->...tn", P, fb, precision=_HIGHEST)
    cc = jnp.einsum("...tn,kn->...tk", jnp.log10(jnp.maximum(mel, 1e-8)),
                    dct, precision=_HIGHEST)
    return jnp.swapaxes(mel, -1, -2), jnp.swapaxes(cc, -1, -2)


def dct_matrix(n: int, dtype=np.float32) -> np.ndarray:
    """Orthonormal DCT-II matrix (row k applied to length-n frames).

    Matches ``fftObj_dct(..., isNorm=1)`` (fft_algorithm.c:139-140,666-669):
    scale sqrt(1/n) for k=0, sqrt(2/n) otherwise.
    """
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m.astype(dtype)


def chroma_normalize(x, norm_type: ChromaDataNormalType):
    """Per-frame normalization over the band axis (last).

    x: (..., T, num). Reference __mnormalize (flux_vector.c) with zero-guard:
    rows whose norm is 0 are left untouched.
    """
    a = jnp.abs(x)
    if norm_type == ChromaDataNormalType.MAX:
        v = jnp.max(a, axis=-1, keepdims=True)
    elif norm_type == ChromaDataNormalType.MIN:
        v = jnp.min(a, axis=-1, keepdims=True)
    elif norm_type == ChromaDataNormalType.P2:
        v = jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
    elif norm_type == ChromaDataNormalType.P1:
        v = jnp.sum(a, axis=-1, keepdims=True)
    else:
        return x
    return jnp.where(v != 0, x / v, x)


def _power_spec(frames, window, fft_length):
    spec = afft.rfft(frames * window, n=fft_length, axis=-1)
    re, im = jnp.real(spec), jnp.imag(spec)
    return re * re + im * im


def xxcc_from_spec(m_data, dct_m, cc_num: int,
                   rectify: CepstralRectifyType = CepstralRectifyType.LOG):
    """Cepstral coefficients from a (..., num, T) band spectrogram.

    log10 (floored at 1e-8) or cubic-root rectification, then ortho DCT-II
    over bands; returns (..., cc_num, T). Reference __spectrogramObj_xxcc
    (spectrogram_algorithm.c:1409-1477).
    """
    from audioflux_tpu.observe import scope
    with scope("af.xxcc"):
        x = jnp.swapaxes(jnp.asarray(m_data), -1, -2)  # (..., T, num)
        if rectify == CepstralRectifyType.CUBIC_ROOT:
            r = jnp.cbrt(x)
        else:
            r = jnp.log10(jnp.maximum(x, 1e-8))
        cc = jnp.einsum("...tn,kn->...tk", r, dct_m[:cc_num],
                        precision=_HIGHEST)
        return jnp.swapaxes(cc, -1, -2)


class Spectrogram:
    """Spectrogram plan: precomputed window + filterbank constants, jitted exec.

    Parameter surface mirrors the reference Python class
    (``python/audioflux/spectrogram.py:31-140``).
    """

    def __init__(self, num=0, samplate=32000, low_fre=None, high_fre=None,
                 bin_per_octave=12, radix2_exp=12, window_type=None,
                 slide_length=None,
                 data_type=SpectralDataType.POWER,
                 filter_bank_type=SpectralFilterBankScaleType.LINEAR,
                 style_type=SpectralFilterBankStyleType.SLANEY,
                 normal_type=SpectralFilterBankNormalType.NONE,
                 is_continue=False):
        S = SpectralFilterBankScaleType
        scale = SpectralFilterBankScaleType(filter_bank_type)
        style = SpectralFilterBankStyleType(style_type)
        norm = SpectralFilterBankNormalType(normal_type)
        data_type = SpectralDataType(data_type)

        if not 1 <= radix2_exp <= 30:
            raise ValueError("radix2_exp must be in [1, 30]")
        fft_length = 1 << radix2_exp

        log_like = scale in (S.OCTAVE, S.LOG, S.LOG_CHROMA, S.DEEP, S.DEEP_CHROMA)
        if low_fre is None:
            low_fre = note_to_hz("C1") if log_like else 0.0
        if high_fre is None:
            high_fre = samplate / 2.0
        if log_like and low_fre < round(note_to_hz("C1"), 3):
            raise ValueError(f"{scale.name} low_fre={low_fre} must be >= 32.703")
        if low_fre < 0:
            raise ValueError("low_fre must be non-negative")

        if window_type is None:
            window_type = (WindowType.HAMM
                           if scale in (S.DEEP, S.DEEP_CHROMA)
                           else WindowType.HANN)
        window_type = WindowType(window_type)

        if slide_length is None:
            slide_length = fft_length // 4

        if bin_per_octave % 12 != 0:
            bin_per_octave = 12

        # --- ctor revision logic (spectrogram_algorithm.c:440-530) ---
        low_index = high_index = 0
        base_num = 0
        if scale in (S.LINEAR, S.CHROMA):
            det = samplate / float(fft_length)
            low_index = int(np.round(np.float32(low_fre) / np.float32(det)))
            high_index = int(np.round(np.float32(high_fre) / np.float32(det)))

        if scale == S.LINEAR:
            num = high_index - low_index + 1
        elif scale == S.OCTAVE:
            # snap to the log grid (isEdge=1): low=log(low), high=low+num-1
            lo = _sc.hz_to_log(low_fre, bin_per_octave)
            low_fre = float(_sc.log_to_hz(lo, bin_per_octave))
            high_fre = float(_sc.log_to_hz(lo + num - 1, bin_per_octave))
            if high_fre > samplate / 2.0:
                raise ValueError("scale log: low_fre and num too large, overflow")
            base_num = num
        elif scale == S.CHROMA:
            if num < 12 or num % 12 != 0:
                num = 12
            base_num = high_index - low_index + 1
        elif scale == S.LOG_CHROMA:
            if num <= 0 or num > bin_per_octave or bin_per_octave % num != 0:
                num = 12
            lo = float(_sc.hz_to_log(low_fre, bin_per_octave))
            hi = float(_sc.hz_to_log(high_fre, bin_per_octave))
            base_num = int(hi - lo) + 1
            low_fre = float(_sc.log_to_hz(lo, bin_per_octave))

        if num < 2 or num > fft_length // 2 + 1:
            raise ValueError(f"num={num} is out of range")

        self.num = num
        self.samplate = samplate
        self.low_fre = low_fre
        self.high_fre = high_fre
        self.bin_per_octave = bin_per_octave
        self.radix2_exp = radix2_exp
        self.fft_length = fft_length
        self.window_type = window_type
        self.slide_length = slide_length
        self.data_type = data_type
        self.filter_bank_type = scale
        self.style_type = style
        self.normal_type = norm
        self.low_index = low_index
        self.high_index = high_index
        self.base_num = base_num
        self.norm_value = 1.0
        self.chroma_data_normal_type = ChromaDataNormalType.MAX
        # cross-call tail carry (SpectrogramBase is_continue, passed to
        # the C stftObj; spectrogram.py:40 + stft_algorithm.c:474-600)
        self.is_continue = bool(is_continue)
        if self.is_continue:
            from audioflux_tpu.transforms.stft import TailCarry
            self._carry = TailCarry(fft_length, slide_length)
        else:
            self._carry = None

        self.window = get_fft_window(window_type, fft_length)

        # --- filterbank constants ---
        self.filter_bank = None
        self.chroma_filter_bank = None
        self.fre_band_arr = None
        self.bin_band_arr = None
        m_len = fft_length // 2 + 1

        if scale in (S.LINSPACE, S.MEL, S.BARK, S.ERB, S.OCTAVE, S.LOG):
            fb, fre, bins = auditory_filter_bank(
                num, fft_length, samplate, scale, style, norm,
                low_fre, high_fre, bin_per_octave)
            self.filter_bank = fb
            self.fre_band_arr = fre
            self.bin_band_arr = bins
        elif scale == S.CHROMA:
            self.filter_bank = chroma_stft_filter_bank(num, fft_length, samplate)
            det = samplate / float(fft_length)
            self.fre_band_arr = (np.arange(low_index, high_index + 1) * det
                                 ).astype(np.float32)
            self.bin_band_arr = np.arange(low_index, high_index + 1,
                                          dtype=np.int32)
        elif scale == S.LOG_CHROMA:
            fb, fre, bins = auditory_filter_bank(
                base_num, fft_length, samplate, S.LOG_CHROMA, style, norm,
                low_fre, high_fre, bin_per_octave)
            self.filter_bank = fb
            self.fre_band_arr = fre
            self.bin_band_arr = bins
            self.chroma_filter_bank = chroma_fold_filter_bank(
                num, base_num, bin_per_octave, low_fre)
        elif scale == S.LINEAR:
            det = samplate / float(fft_length)
            self.fre_band_arr = (np.arange(low_index, high_index + 1) * det
                                 ).astype(np.float32)
            self.bin_band_arr = np.arange(low_index, high_index + 1,
                                          dtype=np.int32)
        else:
            raise NotImplementedError(
                f"scale {scale.name} is provided by audioflux_tpu.transforms.deep")

        self._mlen = m_len
        self._build_exec()

    # ------------------------------------------------------------------
    def _build_exec(self):
        S = SpectralFilterBankScaleType
        scale = self.filter_bank_type
        data_type = self.data_type
        fft_length = self.fft_length
        slide = self.slide_length
        window = jnp.asarray(self.window)
        norm_value = self.norm_value
        low_index, high_index = self.low_index, self.high_index
        m_len = self._mlen
        fb = None if self.filter_bank is None else jnp.asarray(self.filter_bank)
        cfb = (None if self.chroma_filter_bank is None
               else jnp.asarray(self.chroma_filter_bank))
        chroma_norm = self.chroma_data_normal_type

        fb_np = self.filter_bank  # numpy: host-side T-layout permutation

        def run(x):
            from audioflux_tpu.observe import scope
            from audioflux_tpu.ops import pallas_fft as pfft

            # TPU: four-step fft kernel; banked scales contract the
            # FULL-spectrum power in the kernel's T-layout bin order
            # (permuted filterbank, zero mirror half — same terms, no
            # bin transpose).  LINEAR/CHROMA-masked paths need natural
            # bin order and pay the one relayout.
            use_kernel = (pfft.supports(fft_length) and fb_np is not None
                          and scale not in (S.LINEAR,)
                          and data_type == SpectralDataType.POWER)
            if use_kernel:
                with scope("af.frame"):
                    frames = frame_signal(x, fft_length, slide)
                with scope("af.power_spec"):
                    zr, zi = pfft.fft4_fwd(frames * window)
                    P = (zr * zr + zi * zi).reshape(
                        zr.shape[:-2] + (fft_length,))
                if norm_value != 1:
                    P = jnp.power(P, norm_value)
                fbm = np.asarray(fb_np, np.float32)
                if scale == S.CHROMA and (low_index != 0
                                          or high_index != fft_length // 2):
                    mask = np.zeros((m_len,), np.float32)
                    mask[low_index:high_index + 1] = 1.0
                    fbm = fbm * mask
                fbT = jnp.asarray(pfft.permute_bins_t(fbm, fft_length))
                with scope("af.filterbank"):
                    out = jnp.einsum("...tf,nf->...tn", P, fbT,
                                     precision=_HIGHEST)
                if scale == S.CHROMA:
                    out = chroma_normalize(out, chroma_norm)
                elif scale == S.LOG_CHROMA:
                    out = jnp.einsum("...tb,nb->...tn", out, cfb,
                                     precision=_HIGHEST)
                    out = chroma_normalize(out, chroma_norm)
                return jnp.swapaxes(out, -1, -2)

            with scope("af.frame"):
                frames = frame_signal(x, fft_length, slide)
            with scope("af.power_spec"):
                S2 = _power_spec(frames, window, fft_length)  # (..., T, m)

            if scale == S.LINEAR:
                if low_index == 0 and high_index == fft_length // 2:
                    out = S2
                else:
                    out = S2[..., low_index:high_index + 1]
                if data_type == SpectralDataType.MAG:
                    out = jnp.sqrt(out)
                    if norm_value != 1:
                        out = jnp.power(out, norm_value)
                elif norm_value != 1:
                    out = jnp.power(out, norm_value)
                return jnp.swapaxes(out, -1, -2)

            Sx = jnp.sqrt(S2) if data_type == SpectralDataType.MAG else S2
            if data_type == SpectralDataType.POWER and norm_value != 1:
                Sx = jnp.power(Sx, norm_value)

            if scale == S.CHROMA:
                if low_index != 0 or high_index != fft_length // 2:
                    mask = np.zeros((m_len,), np.float32)
                    mask[low_index:high_index + 1] = 1.0
                    Sx = Sx * mask
                out = jnp.einsum("...tf,nf->...tn", Sx, fb, precision=_HIGHEST)
                if data_type == SpectralDataType.MAG and norm_value != 1:
                    out = jnp.power(out, norm_value)
                out = chroma_normalize(out, chroma_norm)
            elif scale == S.LOG_CHROMA:
                mid = jnp.einsum("...tf,nf->...tn", Sx, fb, precision=_HIGHEST)
                out = jnp.einsum("...tb,nb->...tn", mid, cfb, precision=_HIGHEST)
                if data_type == SpectralDataType.MAG and norm_value != 1:
                    out = jnp.power(out, norm_value)
                out = chroma_normalize(out, chroma_norm)
            else:
                with scope("af.filterbank"):
                    out = jnp.einsum("...tf,nf->...tn", Sx, fb,
                                     precision=_HIGHEST)
                if data_type == SpectralDataType.MAG and norm_value != 1:
                    out = jnp.power(out, norm_value)
            return jnp.swapaxes(out, -1, -2)

        self._run = jax.jit(run)
        self._dct = dct_matrix(self.num)

    # ------------------------------------------------------------------
    def set_data_norm_value(self, norm_value: float):
        self.norm_value = float(norm_value)
        self._build_exec()

    def set_chroma_data_normal_type(self, t: ChromaDataNormalType):
        self.chroma_data_normal_type = ChromaDataNormalType(t)
        self._build_exec()

    def cal_time_length(self, data_length: int) -> int:
        if self._carry is not None:
            return self._carry.cal_time_length(data_length)
        return cal_time_length(data_length, self.fft_length, self.slide_length)

    def get_fre_band_arr(self):
        return self.fre_band_arr

    def get_bin_band_arr(self):
        return self.bin_band_arr

    def get_band_num(self):
        return self.num

    def get_bin_band_length(self):
        """Band count (spectrogramObj_getBinBandLength,
        spectrogram_algorithm.c:3192 returns ->num)."""
        return self.num

    def set_deep_order(self, deep_order: int):
        """Stored for DEEP-scale neighbor-channel layout
        (spectrogramObj_setDeepOrder; a no-op for non-deep scales, as in
        the C).  1/2 -> 3 channels, 3/4 -> 5 channels."""
        if deep_order not in (1, 2, 3, 4):
            raise ValueError(f"deep_order={deep_order} must be in [1,4]")
        self.deep_order = int(deep_order)

    # ------------------------------------------------------------------
    def spectrogram(self, data_arr):
        """Compute the band spectrogram: (..., n) -> (..., num, time).

        With ``is_continue`` set, consecutive calls carry the unconsumed
        sample tail across calls (streaming), like the C spectrogramObj.
        """
        if self._carry is not None:
            buf = self._carry.feed(np.asarray(data_arr, np.float32))
            if buf is None:
                return np.zeros(np.shape(data_arr)[:-1] + (self.num, 0),
                                np.float32)
            data_arr = buf
        return self._run(jnp.asarray(data_arr, jnp.float32))

    def spectrogram_mfcc_fused(self, data_arr, cc_num: int = 13,
                               tile: int = 200, fast: bool = True):
        """Fused-Pallas band spectrogram + cepstral coefficients (TPU).

        Single-kernel VMEM-resident framing -> DFT -> power -> filterbank
        -> log-DCT pipeline (``ops.pallas_spectrogram``); the throughput
        path for bulk extraction.  Requires a plain power-domain filterbank
        config (POWER data type, no chroma fold, norm_value 1), slide
        dividing fft and 128 | slide; any frame count works (zero-padded
        to a tile multiple and sliced back).
        ``fast=True`` uses bf16x3 MXU dots (~2e-6 relative error);
        ``fast=False`` is full fp32 (~2e-7).  Returns
        ((..., num, T), (..., cc_num, T)).
        """
        S = SpectralFilterBankScaleType
        if (self.filter_bank is None
                or self.filter_bank_type in (S.CHROMA, S.LOG_CHROMA)
                or self.data_type != SpectralDataType.POWER
                or self.norm_value != 1):
            raise ValueError("fused path needs a plain POWER filterbank "
                             "spectrogram; use .spectrogram()")
        n_frames = (data_arr.shape[-1] - self.fft_length) \
            // self.slide_length + 1
        if n_frames < 8:
            # small-clip plan: the fs4 kernel needs >=8-frame tiles for MXU
            # utilization (pair packing, 128-lane DFT); short clips are a
            # pure batched matrix pipeline — one fft + two MXU einsums over
            # the stacked batch, no framing relayout at T=1.  The device
            # constants are cached per instance: re-uploading the (num, n)
            # filterbank through the axon tunnel on every call costs more
            # than the whole computation.
            from audioflux_tpu.ops import pallas_fft as pfft
            use_kernel = pfft.supports(self.fft_length)
            if not hasattr(self, "_fused_cache"):
                self._fused_cache = {}
            key = ("_small_t_consts", cc_num, use_kernel)
            consts = self._fused_cache.get(key)
            if consts is None:
                fb = (pfft.permute_bins_t(self.filter_bank, self.fft_length)
                      if use_kernel else self.filter_bank)
                consts = (jnp.asarray(self.window), jnp.asarray(fb),
                          jnp.asarray(self._dct[:cc_num]))
                self._fused_cache[key] = consts
            w_dev, fb_dev, dct_dev = consts
            return _small_t_mel_cc(jnp.asarray(data_arr, jnp.float32),
                                   w_dev, fb_dev, dct_dev,
                                   fft_length=self.fft_length,
                                   slide_length=self.slide_length,
                                   use_kernel=use_kernel)
        from audioflux_tpu.ops.pallas_spectrogram import (FusedMelPlan,
                                                          fused_mel_mfcc)
        key = ("_fused_plan", cc_num)
        plan = getattr(self, "_fused_cache", {}).get(key)
        if plan is None:
            plan = FusedMelPlan(self.window, self.filter_bank,
                                self._dct[:cc_num], self.slide_length)
            if not hasattr(self, "_fused_cache"):
                self._fused_cache = {}
            self._fused_cache[key] = plan
        return fused_mel_mfcc(plan, data_arr, tile=tile, fast=fast)

    def xxcc(self, m_data_arr, cc_num: int = 13,
             rectify_type: CepstralRectifyType = CepstralRectifyType.LOG):
        if cc_num > self.num:
            raise ValueError(f"cc_num={cc_num} must be <= num={self.num}")
        return xxcc_from_spec(m_data_arr, jnp.asarray(self._dct), cc_num,
                              CepstralRectifyType(rectify_type))

    def mfcc(self, m_data_arr, cc_num: int = 13):
        if not (self.filter_bank_type == SpectralFilterBankScaleType.MEL
                and self.style_type == SpectralFilterBankStyleType.SLANEY):
            raise ValueError("mfcc requires MEL scale and SLANEY style")
        return self.xxcc(m_data_arr, cc_num)

    def bfcc(self, m_data_arr, cc_num: int = 13):
        if not (self.filter_bank_type == SpectralFilterBankScaleType.BARK
                and self.style_type == SpectralFilterBankStyleType.SLANEY):
            raise ValueError("bfcc requires BARK scale and SLANEY style")
        return self.xxcc(m_data_arr, cc_num)

    def gtcc(self, m_data_arr, cc_num: int = 13):
        if self.style_type != SpectralFilterBankStyleType.GAMMATONE:
            raise ValueError("gtcc requires GAMMATONE style")
        return self.xxcc(m_data_arr, cc_num)

    def lfcc(self, m_data_arr, cc_num: int = 13):
        if self.filter_bank_type != SpectralFilterBankScaleType.LINEAR:
            raise ValueError("lfcc requires LINEAR scale")
        return self.xxcc(m_data_arr, cc_num)

    # ------------------------------------------------------------------
    def y_coords(self):
        return self.fre_band_arr

    def x_coords(self, data_length: int):
        T = self.cal_time_length(data_length)
        return np.arange(T) * self.slide_length / self.samplate


class MelSpectrogram(Spectrogram):
    def __init__(self, num=128, samplate=32000, low_fre=None, high_fre=None,
                 radix2_exp=12, window_type=None, slide_length=None,
                 data_type=SpectralDataType.POWER,
                 style_type=SpectralFilterBankStyleType.SLANEY,
                 normal_type=SpectralFilterBankNormalType.NONE,
                 is_continue=False):
        super().__init__(num=num, samplate=samplate, low_fre=low_fre,
                         high_fre=high_fre, bin_per_octave=12,
                         radix2_exp=radix2_exp, window_type=window_type,
                         slide_length=slide_length, data_type=data_type,
                         filter_bank_type=SpectralFilterBankScaleType.MEL,
                         style_type=style_type, normal_type=normal_type,
                         is_continue=is_continue)


class BarkSpectrogram(Spectrogram):
    def __init__(self, num=128, samplate=32000, low_fre=None, high_fre=None,
                 radix2_exp=12, window_type=None, slide_length=None,
                 data_type=SpectralDataType.POWER,
                 style_type=SpectralFilterBankStyleType.SLANEY,
                 normal_type=SpectralFilterBankNormalType.NONE,
                 is_continue=False):
        super().__init__(num=num, samplate=samplate, low_fre=low_fre,
                         high_fre=high_fre, bin_per_octave=12,
                         radix2_exp=radix2_exp, window_type=window_type,
                         slide_length=slide_length, data_type=data_type,
                         filter_bank_type=SpectralFilterBankScaleType.BARK,
                         style_type=style_type, normal_type=normal_type,
                         is_continue=is_continue)


class ErbSpectrogram(Spectrogram):
    def __init__(self, num=128, samplate=32000, low_fre=None, high_fre=None,
                 radix2_exp=12, window_type=None, slide_length=None,
                 data_type=SpectralDataType.POWER,
                 style_type=SpectralFilterBankStyleType.SLANEY,
                 normal_type=SpectralFilterBankNormalType.NONE,
                 is_continue=False):
        super().__init__(num=num, samplate=samplate, low_fre=low_fre,
                         high_fre=high_fre, bin_per_octave=12,
                         radix2_exp=radix2_exp, window_type=window_type,
                         slide_length=slide_length, data_type=data_type,
                         filter_bank_type=SpectralFilterBankScaleType.ERB,
                         style_type=style_type, normal_type=normal_type,
                         is_continue=is_continue)


# ---------------------------------------------------------------------------
# SpectrogramBase feature forwarding (python/audioflux/spectrogram.py:328-1770)
# ---------------------------------------------------------------------------

_SPECTRAL_FWD = [
    "flatness", "flux", "rolloff", "centroid", "spread", "skewness",
    "kurtosis", "entropy", "crest", "slope", "decrease", "band_width",
    "rms", "energy", "hfc", "sd", "sf", "mkl", "pd", "wpd", "nwpd", "cd",
    "rcd", "broadband", "novelty", "eef", "eer", "max", "mean", "var",
]


def _make_forward(name):
    def fwd(self, m_data_arr, *args, **kwargs):
        sp = self._spectral_obj()
        return getattr(sp, name)(m_data_arr, *args, **kwargs)
    fwd.__name__ = name
    fwd.__doc__ = (f"Forwarded Spectral.{name} over this plan's bands "
                   f"(edge subset applies). See features.spectral.")
    return fwd


def _spectral_obj(self):
    from audioflux_tpu.features.spectral import Spectral
    if getattr(self, "_spectral_cache", None) is None:
        self._spectral_cache = Spectral(self.num, self.fre_band_arr)
        if getattr(self, "_edge", None) is not None:
            kind, val = self._edge
            if kind == "range":
                self._spectral_cache.set_edge(*val)
            else:
                self._spectral_cache.set_edge_arr(val)
    return self._spectral_cache


def _set_edge(self, start: int, end: int):
    """Restrict forwarded spectral features to bands [start, end]."""
    self._edge = ("range", (start, end))
    self._spectral_cache = None


def _set_edge_arr(self, index_arr):
    self._edge = ("arr", np.asarray(index_arr, np.int64))
    self._spectral_cache = None


def _preprocess(self, m_data_arr):
    """COA normalization of a band spectrogram
    (spectrogramObj_preprocess, spectrogram_algorithm.c:2080-2118)."""
    w_sum = float(np.sum(self.window, dtype=np.float64))
    if self.data_type == SpectralDataType.MAG:
        value = 0.5 * w_sum
    else:
        value = 0.5 * w_sum * w_sum
    x = jnp.asarray(m_data_arr) / value
    scale = np.ones(self.num, np.float32)
    if self.bin_band_arr is not None:
        edge = (np.asarray(self.bin_band_arr) == 0) | \
               (np.asarray(self.bin_band_arr) == self.fft_length // 2)
        scale[edge[:self.num]] = 0.5
    else:
        scale[0] = 0.5
    return x * scale[:, None]


def _deconv(self, m_data_arr):
    """Timbre/pitch deconvolution of this plan's spectrogram."""
    from audioflux_tpu.features.deconv import Deconv
    return Deconv(self.num).deconv(m_data_arr)


Spectrogram._spectral_obj = _spectral_obj
Spectrogram.set_edge = _set_edge
Spectrogram.set_edge_arr = _set_edge_arr
Spectrogram.preprocess = _preprocess
Spectrogram.deconv = _deconv
for _name in _SPECTRAL_FWD:
    setattr(Spectrogram, _name, _make_forward(_name))
