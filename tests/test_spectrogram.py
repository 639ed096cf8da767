"""Spectrogram hub parity vs reference C goldens (mel/bark/erb/linear/octave,
MFCC/BFCC/GTCC, chroma, mag mode) plus batching behavior."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.spectrogram import (
    BarkSpectrogram, ErbSpectrogram, MelSpectrogram, Spectrogram,
)
from audioflux_tpu.types import (
    SpectralDataType,
    SpectralFilterBankScaleType as S,
    SpectralFilterBankStyleType as ST,
)

SR = 32000
R2E = 11
SLIDE = 512


def test_mel_spectrogram(goldens, signals):
    g = goldens("spectrogram")
    obj = MelSpectrogram(num=128, samplate=SR, radix2_exp=R2E, slide_length=SLIDE)
    spec = obj.spectrogram(signals["sine"])
    assert_close_to_golden(spec, g["mel_spec"], 5e-5, "mel_spec")
    np.testing.assert_allclose(obj.get_fre_band_arr(), g["mel_fre"],
                               rtol=3e-6, atol=2e-3)


def test_mfcc(goldens, signals):
    g = goldens("spectrogram")
    obj = MelSpectrogram(num=128, samplate=SR, radix2_exp=R2E, slide_length=SLIDE)
    spec = obj.spectrogram(signals["sine"])
    mfcc = obj.mfcc(spec, cc_num=13)
    np.testing.assert_allclose(np.asarray(mfcc), g["mel_mfcc"], atol=2e-4)


def test_bark_and_bfcc(goldens, signals):
    g = goldens("spectrogram")
    obj = BarkSpectrogram(num=64, samplate=SR, radix2_exp=R2E, slide_length=SLIDE)
    spec = obj.spectrogram(signals["sine"])
    assert_close_to_golden(spec, g["bark_spec"], 5e-5, "bark_spec")
    bfcc = obj.bfcc(spec, cc_num=13)
    np.testing.assert_allclose(np.asarray(bfcc), g["bark_bfcc"], atol=2e-4)


def test_erb(goldens, signals):
    g = goldens("spectrogram")
    obj = ErbSpectrogram(num=64, samplate=SR, radix2_exp=R2E, slide_length=SLIDE)
    assert_close_to_golden(obj.spectrogram(signals["sine"]), g["erb_spec"],
                           5e-5, "erb_spec")


def test_gammatone_and_gtcc(goldens, signals):
    g = goldens("spectrogram")
    obj = Spectrogram(num=64, samplate=SR, radix2_exp=R2E, slide_length=SLIDE,
                      filter_bank_type=S.ERB, style_type=ST.GAMMATONE)
    spec = obj.spectrogram(signals["sine"])
    assert_close_to_golden(spec, g["gamma_spec"], 5e-5, "gamma_spec")
    gtcc = obj.gtcc(spec, cc_num=13)
    np.testing.assert_allclose(np.asarray(gtcc), g["gamma_gtcc"], atol=3e-4)


def test_linear(goldens, signals):
    g = goldens("spectrogram")
    obj = Spectrogram(samplate=SR, radix2_exp=R2E, slide_length=SLIDE,
                      filter_bank_type=S.LINEAR)
    assert_close_to_golden(obj.spectrogram(signals["sine"]), g["linear_spec"],
                           5e-5, "linear_spec")


def test_linear_subrange(goldens, signals):
    g = goldens("spectrogram")
    obj = Spectrogram(samplate=SR, radix2_exp=R2E, slide_length=SLIDE,
                      low_fre=100.0, high_fre=8000.0, filter_bank_type=S.LINEAR)
    assert_close_to_golden(obj.spectrogram(signals["sine"]),
                           g["linear_sub_spec"], 5e-5, "linear_sub_spec")


def test_octave(goldens, signals):
    g = goldens("spectrogram")
    obj = Spectrogram(num=84, samplate=SR, radix2_exp=R2E, slide_length=SLIDE,
                      filter_bank_type=S.OCTAVE)
    assert_close_to_golden(obj.spectrogram(signals["chirp"]),
                           g["octave_spec"], 5e-5, "octave_spec")


def test_mel_mag(goldens, signals):
    g = goldens("spectrogram")
    obj = MelSpectrogram(num=128, samplate=SR, radix2_exp=R2E,
                         slide_length=SLIDE, data_type=SpectralDataType.MAG)
    assert_close_to_golden(obj.spectrogram(signals["sine"]),
                           g["mel_mag_spec"], 5e-5, "mel_mag_spec")


def test_chroma(goldens, signals):
    g = goldens("chroma")
    obj = Spectrogram(num=12, samplate=SR, radix2_exp=R2E, slide_length=SLIDE,
                      filter_bank_type=S.CHROMA)
    assert_close_to_golden(obj.spectrogram(signals["chord"]),
                           g["chroma_spec"], 2e-4, "chroma_spec")


def test_batched_matches_single(signals):
    obj = MelSpectrogram(num=128, samplate=SR, radix2_exp=R2E,
                         slide_length=SLIDE)
    x = signals["sine"]
    batch = np.stack([x, x * 0.5, np.roll(x, 100)])
    out = np.asarray(obj.spectrogram(batch))
    single = np.asarray(obj.spectrogram(batch[2]))
    assert out.shape == (3, 128, single.shape[-1])
    np.testing.assert_allclose(out[2], single, rtol=1e-6, atol=1e-6)


def test_time_length_formula():
    obj = MelSpectrogram(num=128, samplate=SR, radix2_exp=R2E,
                         slide_length=SLIDE)
    assert obj.cal_time_length(32000) == (32000 - 2048) // 512 + 1
    assert obj.cal_time_length(2048) == 1
    assert obj.cal_time_length(2047) == 0


def test_spectral_forwarding(goldens, signals):
    """SpectrogramBase forwards the Spectral surface + deconv/preprocess."""
    import audioflux_tpu as af
    obj = af.MelSpectrogram(num=64, samplate=SR, radix2_exp=R2E,
                            slide_length=SLIDE)
    spec = obj.spectrogram(signals["sine"])
    from audioflux_tpu.features.spectral import Spectral
    sp = Spectral(64, obj.get_fre_band_arr())
    np.testing.assert_allclose(np.asarray(obj.centroid(spec)),
                               np.asarray(sp.centroid(spec)), rtol=1e-6)
    obj.set_edge(4, 40)
    sp2 = Spectral(64, obj.get_fre_band_arr())
    sp2.set_edge(4, 40)
    np.testing.assert_allclose(np.asarray(obj.flatness(spec)),
                               np.asarray(sp2.flatness(spec)), rtol=1e-6)
    t, p = obj.deconv(spec)
    assert np.asarray(t).shape == np.asarray(spec).shape
    pre = np.asarray(obj.preprocess(spec))
    assert pre.shape == np.asarray(spec).shape
