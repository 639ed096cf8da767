"""One-shot functional API.

Mirrors ``python/audioflux/core.py:17-1358``: convenience wrappers that
build the matching plan object, run it, and return numpy-compatible arrays.
"""

from __future__ import annotations

import functools

import numpy as np

from audioflux_tpu.features.xxcc import XXCC as _XXCC
from audioflux_tpu.transforms.bft import BFT as _BFT
from audioflux_tpu.transforms.cqt import CQT as _CQT, VQT as _VQT
from audioflux_tpu.transforms.spectrogram import (BarkSpectrogram,
                                                  ErbSpectrogram,
                                                  MelSpectrogram,
                                                  Spectrogram)
from audioflux_tpu.types import (CepstralRectifyType, ChromaDataNormalType,
                                 SpectralDataType,
                                 SpectralFilterBankNormalType,
                                 SpectralFilterBankScaleType,
                                 SpectralFilterBankStyleType, WindowType)
from audioflux_tpu.utils.convert import note_to_hz

__all__ = [
    "linear_spectrogram", "mel_spectrogram", "bark_spectrogram",
    "erb_spectrogram", "mfcc", "bfcc", "gtcc", "cqcc", "cqt", "vqt",
    "chroma_linear", "chroma_octave", "chroma_cqt",
]


@functools.lru_cache(maxsize=256)
def _plan_cache(cls, items, chroma_norm=None):
    obj = cls(**dict(items))
    if chroma_norm is not None:
        obj.set_chroma_data_normal_type(chroma_norm)
    return obj


def _plan(cls, _chroma_norm=None, **kwargs):
    """Memoized plan constructor for the one-shot API.

    Each plan object owns a ``jax.jit`` wrapper whose compilation cache
    dies with the object, so rebuilding a plan per call (the reference's
    one-shot wrappers do: ``python/audioflux/core.py:17-1358``) would
    recompile the XLA program on every invocation.  All constructor
    arguments are hashable scalars/enums, so identical one-shot calls
    reuse one plan — and therefore one compiled executable.
    """
    return _plan_cache(cls, tuple(sorted(kwargs.items())), _chroma_norm)


def linear_spectrogram(X, num=None, radix2_exp=12, samplate=32000,
                       slide_length=None, low_fre=0.0,
                       window_type=WindowType.HANN,
                       style_type=SpectralFilterBankStyleType.SLANEY,
                       data_type=SpectralDataType.POWER,
                       is_reassign=False):
    """Linear/STFT spectrogram via BFT, exactly like the reference
    one-shot (core.py:17-141: result_type 1, style/data/is_reassign
    pass-through, num defaulting to fft//2+1)."""
    if num is None:
        num = (1 << radix2_exp) // 2 + 1
    obj = _plan(_BFT, num=num, radix2_exp=radix2_exp, samplate=samplate,
                low_fre=low_fre, window_type=window_type,
                slide_length=slide_length,
                scale_type=SpectralFilterBankScaleType.LINEAR,
                style_type=style_type, data_type=data_type,
                is_reassign=is_reassign)
    return obj.bft(X, result_type=1), obj.get_fre_band_arr()


def _band_spectrogram(cls, X, num, radix2_exp, samplate, slide_length,
                      low_fre, high_fre, window_type, data_type, style_type,
                      normal_type):
    obj = _plan(cls, num=num, samplate=samplate, radix2_exp=radix2_exp,
              slide_length=slide_length, low_fre=low_fre, high_fre=high_fre,
              window_type=window_type, data_type=data_type,
              style_type=style_type, normal_type=normal_type)
    return obj, obj.spectrogram(X)


def mel_spectrogram(X, num=128, radix2_exp=12, samplate=32000,
                    slide_length=None, low_fre=0.0, high_fre=None,
                    window_type=WindowType.HANN,
                    data_type=SpectralDataType.POWER,
                    style_type=SpectralFilterBankStyleType.SLANEY,
                    normal_type=SpectralFilterBankNormalType.NONE):
    obj, spec = _band_spectrogram(
        MelSpectrogram, X, num, radix2_exp, samplate, slide_length, low_fre,
        high_fre, window_type, data_type, style_type, normal_type)
    return spec, obj.get_fre_band_arr()


def bark_spectrogram(X, num=128, radix2_exp=12, samplate=32000,
                     slide_length=None, low_fre=0.0, high_fre=None,
                     window_type=WindowType.HANN,
                     data_type=SpectralDataType.POWER,
                     style_type=SpectralFilterBankStyleType.SLANEY,
                     normal_type=SpectralFilterBankNormalType.NONE):
    obj, spec = _band_spectrogram(
        BarkSpectrogram, X, num, radix2_exp, samplate, slide_length, low_fre,
        high_fre, window_type, data_type, style_type, normal_type)
    return spec, obj.get_fre_band_arr()


def erb_spectrogram(X, num=128, radix2_exp=12, samplate=32000,
                    slide_length=None, low_fre=0.0, high_fre=None,
                    window_type=WindowType.HANN,
                    data_type=SpectralDataType.POWER,
                    style_type=SpectralFilterBankStyleType.SLANEY,
                    normal_type=SpectralFilterBankNormalType.NONE):
    obj, spec = _band_spectrogram(
        ErbSpectrogram, X, num, radix2_exp, samplate, slide_length, low_fre,
        high_fre, window_type, data_type, style_type, normal_type)
    return spec, obj.get_fre_band_arr()


def _bft_cc(scale_type, style_type, X, num, cc_num, rectify_type,
            radix2_exp, samplate, slide_length, low_fre, high_fre,
            window_type):
    """The reference cc one-shots (core.py:600-830) run BFT with an
    AREA-normalized POWER bank, take |complex result| and feed XXCC —
    NOT the xx_spectrogram + xxcc composition of the classes."""
    obj = _plan(_BFT, num=num, radix2_exp=radix2_exp, samplate=samplate,
                low_fre=low_fre, high_fre=high_fre,
                window_type=window_type, slide_length=slide_length,
                scale_type=scale_type, style_type=style_type,
                normal_type=SpectralFilterBankNormalType.AREA,
                data_type=SpectralDataType.POWER)
    spec = np.abs(np.asarray(obj.bft(X, result_type=0)))
    cc = _XXCC(obj.num).xxcc(spec, cc_num, rectify_type)
    return cc, obj.get_fre_band_arr()


def mfcc(X, cc_num=13, rectify_type=CepstralRectifyType.LOG, mel_num=128,
         radix2_exp=12, samplate=32000, slide_length=None,
         low_fre=None, high_fre=None, window_type=WindowType.HANN):
    return _bft_cc(SpectralFilterBankScaleType.MEL,
                   SpectralFilterBankStyleType.SLANEY, X, mel_num, cc_num,
                   rectify_type, radix2_exp, samplate, slide_length,
                   low_fre, high_fre, window_type)


def bfcc(X, cc_num=13, rectify_type=CepstralRectifyType.LOG, bark_num=128,
         radix2_exp=12, samplate=32000, slide_length=None,
         low_fre=None, high_fre=None, window_type=WindowType.HANN):
    return _bft_cc(SpectralFilterBankScaleType.BARK,
                   SpectralFilterBankStyleType.SLANEY, X, bark_num, cc_num,
                   rectify_type, radix2_exp, samplate, slide_length,
                   low_fre, high_fre, window_type)


def gtcc(X, cc_num=13, rectify_type=CepstralRectifyType.LOG, erb_num=128,
         radix2_exp=12, samplate=32000, slide_length=None,
         low_fre=None, high_fre=None, window_type=WindowType.HANN):
    return _bft_cc(SpectralFilterBankScaleType.ERB,
                   SpectralFilterBankStyleType.GAMMATONE, X, erb_num,
                   cc_num, rectify_type, radix2_exp, samplate, slide_length,
                   low_fre, high_fre, window_type)


def cqt(X, num=84, samplate=32000, low_fre=None, bin_per_octave=12,
        factor=1.0, thresh=0.01, window_type=WindowType.HANN,
        slide_length=None,
        normal_type=SpectralFilterBankNormalType.AREA, is_scale=True):
    obj = _plan(_CQT, num=num, samplate=samplate, low_fre=low_fre,
                bin_per_octave=bin_per_octave, factor=factor, thresh=thresh,
                window_type=window_type, slide_length=slide_length,
                normal_type=normal_type, is_scale=is_scale)
    # the reference one-shot returns |CQT| (core.py:1040 ``np.abs``), not
    # the complex matrix — use the CQT class for complex output
    return np.abs(obj.cqt(X)), obj.get_fre_band_arr()


def vqt(X, num=84, samplate=32000, low_fre=None, bin_per_octave=12,
        factor=1.0, beta=0.5, thresh=0.01, window_type=WindowType.HANN,
        slide_length=None,
        normal_type=SpectralFilterBankNormalType.AREA, is_scale=True):
    obj = _plan(_VQT, num=num, samplate=samplate, low_fre=low_fre,
                bin_per_octave=bin_per_octave, factor=factor, beta=beta,
                thresh=thresh, window_type=window_type,
                slide_length=slide_length, normal_type=normal_type,
                is_scale=is_scale)
    return np.abs(obj.cqt(X)), obj.get_fre_band_arr()


def cqcc(X, cc_num=13, rectify_type=CepstralRectifyType.LOG, cqt_num=84,
         samplate=32000, low_fre=None, slide_length=None,
         bin_per_octave=12, window_type=WindowType.HANN,
         normal_type=SpectralFilterBankNormalType.AREA, is_scale=True,
         factor=1.0, thresh=0.01):
    obj = _plan(_CQT, num=cqt_num, samplate=samplate, low_fre=low_fre,
                bin_per_octave=bin_per_octave, factor=factor, thresh=thresh,
                window_type=window_type, slide_length=slide_length,
                normal_type=normal_type, is_scale=is_scale)
    C = obj.cqt(X)
    # the reference one-shot feeds |C|^2 (POWER) into cqtObj_cqcc
    # (core.py:929 ``power_arr = np.abs(spec_arr) ** 2``), unlike the
    # class-level usage with magnitude — mirrored for drop-in parity
    return (obj.cqcc(np.abs(np.asarray(C)) ** 2, cc_num, rectify_type),
            obj.get_fre_band_arr())


def chroma_linear(X, chroma_num=12, radix2_exp=12, samplate=32000,
                  low_fre=0.0, high_fre=16000.0, slide_length=None,
                  window_type=WindowType.HANN,
                  style_type=SpectralFilterBankStyleType.SLANEY,
                  data_type=SpectralDataType.POWER,
                  normal_type=SpectralFilterBankNormalType.NONE,
                  norm_type=ChromaDataNormalType.MAX):
    obj = _plan(Spectrogram, _chroma_norm=norm_type, num=chroma_num,
                samplate=samplate, radix2_exp=radix2_exp,
                slide_length=slide_length, low_fre=low_fre,
                high_fre=high_fre, window_type=window_type,
                style_type=style_type, normal_type=normal_type,
                data_type=data_type,
                filter_bank_type=SpectralFilterBankScaleType.CHROMA)
    return obj.spectrogram(X)


def chroma_octave(X, chroma_num=12, radix2_exp=12, samplate=32000,
                  low_fre=None, high_fre=16000.0, bin_per_octave=12,
                  slide_length=None, window_type=WindowType.HANN,
                  data_type=SpectralDataType.POWER,
                  style_type=SpectralFilterBankStyleType.SLANEY,
                  normal_type=SpectralFilterBankNormalType.NONE,
                  norm_type=ChromaDataNormalType.MAX):
    if low_fre is None:
        low_fre = note_to_hz("C1")
    obj = _plan(Spectrogram, _chroma_norm=norm_type, num=chroma_num,
                samplate=samplate, radix2_exp=radix2_exp,
                slide_length=slide_length, low_fre=low_fre,
                high_fre=high_fre, bin_per_octave=bin_per_octave,
                window_type=window_type, data_type=data_type,
                style_type=style_type, normal_type=normal_type,
                filter_bank_type=SpectralFilterBankScaleType.LOG_CHROMA)
    return obj.spectrogram(X)


def chroma_cqt(X, chroma_num=12, num=84, samplate=32000, low_fre=None,
               bin_per_octave=12, factor=1.0, thresh=0.01,
               window_type=WindowType.HANN, slide_length=None,
               normal_type=SpectralFilterBankNormalType.AREA, is_scale=True,
               data_type=SpectralDataType.POWER,
               norm_type=ChromaDataNormalType.MAX):
    obj = _plan(_CQT, num=num, samplate=samplate, low_fre=low_fre,
                bin_per_octave=bin_per_octave, factor=factor, thresh=thresh,
                window_type=window_type, slide_length=slide_length,
                normal_type=normal_type, is_scale=is_scale)
    C = obj.cqt(X)
    # the reference one-shot squares the COMPLEX cqt matrix before the
    # chroma fold (core.py:1457 ``power_arr = cqt_arr ** 2``), so the fold
    # effectively weights by |C|^4 under the default POWER data type —
    # mirrored verbatim for drop-in parity
    return obj.chroma(C ** 2, chroma_num, data_type, norm_type)
