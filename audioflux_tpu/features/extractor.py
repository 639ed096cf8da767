"""Batch feature extraction façade over the transform families.

Mirrors ``python/audioflux/feature/extractor.py:40-446``: build several
transform plans at once, run them over the same audio, then push the
resulting spectrograms through Spectral / XXCC / Deconv. No state crosses
transforms — each result is an independent jitted pipeline.
"""

from __future__ import annotations

import numpy as np

from audioflux_tpu.features.deconv import Deconv
from audioflux_tpu.features.spectral import Spectral
from audioflux_tpu.features.xxcc import XXCC
from audioflux_tpu.types import (CepstralRectifyType, SpectralDataType,
                                 SpectralFilterBankScaleType,
                                 WaveletContinueType, WaveletDiscreteType)

__all__ = ["FeatureExtractor", "FeatureResult"]

_TRANSFORMS = ("bft", "nsgt", "cwt", "pwt", "cqt", "st", "fst", "dwt", "wpt")


class FeatureResult(dict):
    """Per-transform result dict (``feature/extractor.py:18-37``)."""

    def __init__(self, name):
        super().__init__()
        self.name = name

    def __repr__(self):
        return f"FeatureResult({self.name}: {list(self.keys())})"


class FeatureExtractor:
    """API mirrors ``python/audioflux/feature/extractor.py:40-446``."""

    def __init__(self, transforms, num=None, radix2_exp=12, samplate=32000,
                 low_fre=None, high_fre=None, bin_per_octave=12,
                 slide_length=None,
                 scale_type=SpectralFilterBankScaleType.LINEAR,
                 wavelet_type=WaveletContinueType.MORSE):
        if isinstance(transforms, str):
            transforms = [transforms]
        for t in transforms:
            if t not in _TRANSFORMS:
                raise ValueError(f"unsupported transform {t!r}; "
                                 f"choose from {_TRANSFORMS}")
        self.transforms = list(transforms)
        self.num = num
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.low_fre = low_fre
        self.high_fre = high_fre
        self.bin_per_octave = bin_per_octave
        self.slide_length = slide_length
        self.scale_type = SpectralFilterBankScaleType(scale_type)
        self.wavelet_type = WaveletContinueType(wavelet_type)
        self._objs = {name: self._create(name) for name in self.transforms}

    # ------------------------------------------------------------------
    def _create(self, name):
        kw = dict(radix2_exp=self.radix2_exp, samplate=self.samplate)
        if name == "bft":
            from audioflux_tpu.transforms.bft import BFT
            from audioflux_tpu.types import (SpectralFilterBankNormalType,
                                             SpectralFilterBankStyleType,
                                             WindowType)
            # the reference facade builds its BFT with MAG data
            # (feature/extractor.py:177-185), not POWER
            return BFT(num=self.num or 128, low_fre=self.low_fre,
                       high_fre=self.high_fre,
                       bin_per_octave=self.bin_per_octave,
                       window_type=WindowType.HANN,
                       slide_length=self.slide_length,
                       scale_type=self.scale_type,
                       style_type=SpectralFilterBankStyleType.SLANEY,
                       normal_type=SpectralFilterBankNormalType.NONE,
                       data_type=SpectralDataType.MAG, **kw)
        if name == "nsgt":
            from audioflux_tpu.transforms.nsgt import NSGT
            return NSGT(num=self.num or 84, low_fre=self.low_fre,
                        high_fre=self.high_fre,
                        bin_per_octave=self.bin_per_octave,
                        scale_type=self.scale_type, **kw)
        if name == "cwt":
            from audioflux_tpu.transforms.cwt import CWT
            return CWT(num=self.num or 84, low_fre=self.low_fre,
                       high_fre=self.high_fre,
                       bin_per_octave=self.bin_per_octave,
                       wavelet_type=self.wavelet_type,
                       scale_type=self.scale_type, **kw)
        if name == "pwt":
            from audioflux_tpu.transforms.pwt import PWT
            return PWT(num=self.num or 84, low_fre=self.low_fre,
                       high_fre=self.high_fre,
                       bin_per_octave=self.bin_per_octave,
                       scale_type=self.scale_type, **kw)
        if name == "cqt":
            from audioflux_tpu.transforms.cqt import CQT
            return CQT(num=84, samplate=self.samplate,
                       bin_per_octave=self.bin_per_octave,
                       slide_length=self.slide_length)
        if name == "st":
            from audioflux_tpu.transforms.st import ST
            return ST(radix2_exp=self.radix2_exp)
        if name == "fst":
            from audioflux_tpu.transforms.fst import FST
            return FST(radix2_exp=self.radix2_exp, samplate=self.samplate)
        if name == "dwt":
            from audioflux_tpu.transforms.dwt import DWT
            return DWT(num=self.num, radix2_exp=self.radix2_exp,
                       samplate=self.samplate)
        if name == "wpt":
            from audioflux_tpu.transforms.dwt import WPT
            return WPT(num=self.num, radix2_exp=self.radix2_exp,
                       samplate=self.samplate)
        raise ValueError(name)

    def _run_one(self, name, obj, x):
        if name == "bft":
            # complex matrix, like the reference facade's default bft()
            return obj.bft(x, result_type=0)
        if name == "nsgt":
            return obj.nsgt(x)
        if name == "cwt":
            return obj.cwt(x)
        if name == "pwt":
            return obj.pwt(x)
        if name == "cqt":
            return obj.cqt(x)
        if name == "st":
            return obj.st(x)
        if name == "fst":
            return obj.fst(x)
        if name == "dwt":
            return obj.dwt(x)[1]
        if name == "wpt":
            return obj.wpt(x)[1]
        raise ValueError(name)

    def _fre_arr(self, name, obj):
        if hasattr(obj, "get_fre_band_arr"):
            try:
                return np.asarray(obj.get_fre_band_arr(), np.float32)
            except TypeError:
                pass
        if name == "st":
            return np.asarray(obj.y_coords(self.samplate), np.float32)
        if name == "fst":
            return np.asarray(obj.y_coords(), np.float32)
        if name == "wpt":
            return np.asarray(obj.y_coords(), np.float32)
        raise ValueError(name)

    # ------------------------------------------------------------------
    def spectrogram(self, data_arr, is_continue=False):
        """Run every transform; returns {name: FeatureResult} with key
        'spectrogram'. Fixed-length transforms (cwt/pwt/st/fst/dwt/wpt)
        truncate the audio to 2**radix2_exp samples."""
        x = np.asarray(data_arr, np.float32)
        out = {}
        L = 1 << self.radix2_exp
        for name, obj in self._objs.items():
            xi = x
            if name in ("cwt", "pwt", "st", "fst", "dwt", "wpt"):
                if x.shape[-1] < L:
                    xi = np.pad(x, [(0, 0)] * (x.ndim - 1)
                                + [(0, L - x.shape[-1])])
                else:
                    xi = x[..., :L]
            r = FeatureResult(name)
            r["spectrogram"] = self._run_one(name, obj, xi)
            out[name] = r
        return out

    def spectral(self, spec_result, spectral, spectral_kw=None,
                 spec_convert=np.abs):
        """Apply one Spectral feature to each transform's spectrogram."""
        spectral_kw = spectral_kw or {}
        out = {}
        for name, r in spec_result.items():
            spec = spec_convert(np.asarray(r["spectrogram"]))
            obj = self._objs[name]
            num = spec.shape[-2]
            fre = self._fre_arr(name, obj)[:num]
            sp = Spectral(num=num, fre_band_arr=fre)
            res = FeatureResult(name)
            res[spectral] = getattr(sp, spectral)(spec, **spectral_kw)
            out[name] = res
        return out

    def xxcc(self, spec_result, cc_num=13,
             rectify_type=CepstralRectifyType.LOG, spec_convert=np.abs):
        out = {}
        for name, r in spec_result.items():
            spec = spec_convert(np.asarray(r["spectrogram"]))
            xx = XXCC(num=spec.shape[-2])
            res = FeatureResult(name)
            res["xxcc"] = xx.xxcc(spec, cc_num, rectify_type)
            out[name] = res
        return out

    def deconv(self, spec_result, spec_convert=np.abs):
        out = {}
        for name, r in spec_result.items():
            spec = spec_convert(np.asarray(r["spectrogram"]))
            dc = Deconv(num=spec.shape[-2])
            timbre, pitch = dc.deconv(spec)
            res = FeatureResult(name)
            res["timbre"] = timbre
            res["pitch"] = pitch
            out[name] = res
        return out
