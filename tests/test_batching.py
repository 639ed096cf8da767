"""Leading-batch-dim semantics across the transform surface.

The reference Python loops channels on the host (format_channel /
revoke_channel); here every transform accepts arbitrary leading dims
natively — each batched row must equal the transform of that row alone.
"""

import numpy as np
import pytest

import audioflux_tpu as af


def _x(shape, seed=0, scale=0.2):
    return (np.random.default_rng(seed).standard_normal(shape) * scale
            ).astype(np.float32)


def _check(fn, x, atol_scale=1e-6):
    """fn maps (..., n) -> (..., *out); rows must match solo runs."""
    batched = np.asarray(fn(x))
    for i in range(x.shape[0]):
        solo = np.asarray(fn(x[i]))
        peak = max(np.max(np.abs(solo)), 1e-12)
        assert batched[i].shape == solo.shape
        assert np.max(np.abs(batched[i] - solo)) <= atol_scale * peak, i


def test_stft_batched_channels():
    obj = af.STFT(radix2_exp=11, slide_length=512)
    _check(lambda d: obj.stft(d), _x((3, 2, 8000)).reshape(6, 8000))


def test_mel_spectrogram_multichannel():
    obj = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=11,
                            slide_length=512)
    x = _x((2, 3, 9000), seed=1)  # (files, channels, n)
    batched = np.asarray(obj.spectrogram(x))
    assert batched.shape[:2] == (2, 3)
    solo = np.asarray(obj.spectrogram(x[1, 2]))
    assert np.allclose(batched[1, 2], solo, atol=1e-6 * np.max(solo))


def test_cqt_batched():
    obj = af.CQT(num=48, samplate=32000, low_fre=af.utils.note_to_hz("C2"))
    _check(lambda d: obj.cqt(d), _x((2, 16384), seed=2), 1e-5)


def test_cwt_batched():
    obj = af.CWT(num=32, samplate=32000, radix2_exp=11)
    _check(lambda d: obj.cwt(d), _x((2, 2048), seed=3), 1e-5)


def test_bft_batched():
    from audioflux_tpu.types import SpectralFilterBankScaleType
    obj = af.BFT(num=64, samplate=32000, radix2_exp=11, slide_length=512,
                 scale_type=SpectralFilterBankScaleType.MEL)
    _check(lambda d: obj.bft(d), _x((2, 6000), seed=4), 1e-5)


def test_nsgt_batched():
    obj = af.NSGT(num=48, samplate=32000, radix2_exp=12)
    _check(lambda d: obj.nsgt(d), _x((2, 4096), seed=5), 1e-5)


def test_spectral_features_batched():
    obj = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=11,
                            slide_length=512)
    spec = obj.spectrogram(_x((2, 3, 9000), seed=6))
    cen = np.asarray(obj.centroid(spec))
    assert cen.shape[:2] == (2, 3)
    solo = np.asarray(obj.centroid(spec[0, 1]))
    assert np.allclose(cen[0, 1], solo, atol=1e-5 * max(np.max(np.abs(solo)),
                                                        1e-9))


def test_mfcc_batched():
    obj = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=11,
                            slide_length=512)
    spec = obj.spectrogram(_x((4, 9000), seed=7))
    cc = np.asarray(obj.xxcc(spec, cc_num=13))
    assert cc.shape == (4, 13, spec.shape[-1])
    solo = np.asarray(obj.xxcc(spec[2], cc_num=13))
    assert np.allclose(cc[2], solo, atol=1e-5 * np.max(np.abs(solo)))


def test_hpss_batched():
    obj = af.HPSS(radix2_exp=10, slide_length=256)
    x = _x((2, 6000), seed=8)
    h, p = obj.hpss(x)
    h1, p1 = obj.hpss(x[1])
    assert np.allclose(np.asarray(h)[1], np.asarray(h1),
                       atol=1e-5 * max(float(np.max(np.abs(h1))), 1e-9))


def test_pitch_yin_batched():
    obj = af.PitchYIN(samplate=32000, radix2_exp=11, slide_length=1024)
    t = np.arange(32000) / 32000
    x = np.stack([0.4 * np.sin(2 * np.pi * 220 * t),
                  0.4 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    fre, v = obj.pitch(x)
    fre = np.asarray(fre)
    assert fre.shape[0] == 2
    mid = fre[:, 5:-5]
    assert np.median(mid[0][mid[0] > 0]) == pytest.approx(220, abs=2)
    assert np.median(mid[1][mid[1] > 0]) == pytest.approx(330, abs=3)
