"""Fused Pallas mel+MFCC kernel vs the exact XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioflux_tpu.transforms.spectrogram import (BarkSpectrogram,
                                                  MelSpectrogram)
from audioflux_tpu.ops.pallas_spectrogram import FusedMelPlan, fused_mel_mfcc


def _ref(plan, x, cc_num=13):
    mel = plan.spectrogram(x)
    cc = plan.xxcc(mel, cc_num=cc_num)
    return np.asarray(mel), np.asarray(cc)


@pytest.mark.parametrize("fast", [False, True])
def test_fused_matches_exact_path(fast):
    plan = MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                          slide_length=512)
    T = 16
    n = T * 512 + 2048 - 512
    x = (np.random.default_rng(0).standard_normal((2, n)) * 0.2
         ).astype(np.float32)
    mel_ref, cc_ref = _ref(plan, x)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:13], 512)
    mel, cc = fused_mel_mfcc(fp, x, tile=8, interpret=True, fast=fast)
    tol = 2e-4 if fast else 1e-5
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        tol * np.max(np.abs(mel_ref)))
    assert np.max(np.abs(np.asarray(cc) - cc_ref)) <= (
        tol * np.max(np.abs(cc_ref)))


def test_fused_method_and_1d(monkeypatch):
    plan = BarkSpectrogram(num=64, samplate=32000, radix2_exp=11,
                           slide_length=512)
    T = 8
    n = T * 512 + 2048 - 512
    x = (np.random.default_rng(1).standard_normal(n) * 0.1
         ).astype(np.float32)
    # route the method through interpret mode (no TPU in CI)
    import audioflux_tpu.ops.pallas_spectrogram as mod
    orig = mod.fused_mel_mfcc
    monkeypatch.setattr(
        mod, "fused_mel_mfcc",
        lambda p, d, tile=200, **kw: orig(
            p, d, tile=tile, **{**kw, "interpret": True}))
    mel, cc = plan.spectrogram_mfcc_fused(x, cc_num=5, tile=8, fast=False)
    mel_ref, cc_ref = _ref(plan, x, cc_num=5)
    assert mel.shape == mel_ref.shape and cc.shape == cc_ref.shape
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        1e-5 * np.max(np.abs(mel_ref)))
    assert np.max(np.abs(np.asarray(cc) - cc_ref)) <= (
        1e-5 * np.max(np.abs(cc_ref)))


def test_fused_rejects_bad_config():
    from audioflux_tpu.types import SpectralDataType
    plan = MelSpectrogram(num=32, samplate=32000, radix2_exp=11,
                          slide_length=512,
                          data_type=SpectralDataType.MAG)
    with pytest.raises(ValueError):
        plan.spectrogram_mfcc_fused(np.zeros(4096, np.float32))


def test_fused_rejects_bad_length():
    plan = MelSpectrogram(num=32, samplate=32000, radix2_exp=11,
                          slide_length=512)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:13], 512)
    # the flip kernel pads internally: any frame count works
    mel, cc = fused_mel_mfcc(fp, np.zeros(10 * 512 + 1536, np.float32),
                             tile=8, interpret=True)
    assert mel.shape[-1] == 10 and cc.shape[-1] == 10
    # the explicit fourstep/dense paths still require tile | frames
    with pytest.raises(ValueError):
        fused_mel_mfcc(fp, np.zeros(10 * 512 + 1536, np.float32), tile=8,
                       interpret=True, algo="fourstep")


def test_fused_other_configs():
    """fft=4096/slide=1024 and a 64-band Erb bank (padding paths)."""
    from audioflux_tpu.transforms.spectrogram import ErbSpectrogram
    plan = ErbSpectrogram(num=64, samplate=32000, radix2_exp=12,
                          slide_length=1024)
    T = 8
    n = T * 1024 + 4096 - 1024
    x = (np.random.default_rng(2).standard_normal(n) * 0.2
         ).astype(np.float32)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:4], 1024)
    mel, cc = fused_mel_mfcc(fp, x, tile=8, interpret=True)
    mel_ref = np.asarray(plan.spectrogram(x))
    cc_ref = np.asarray(plan.xxcc(mel_ref, cc_num=4))
    assert mel.shape == mel_ref.shape and cc.shape == cc_ref.shape
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        2e-5 * np.max(np.abs(mel_ref)))
    assert np.max(np.abs(np.asarray(cc) - cc_ref)) <= (
        2e-5 * np.max(np.abs(cc_ref)))


def test_fused_fs4_matches_exact_path():
    """Frame-pair kernel (two real frames per complex DFT) vs exact."""
    plan = MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                          slide_length=512)
    T = 32
    n = T * 512 + 2048 - 512
    x = (np.random.default_rng(3).standard_normal((2, n)) * 0.2
         ).astype(np.float32)
    mel_ref, cc_ref = _ref(plan, x)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:13], 512)
    assert fp.fs4_ok
    mel, cc = fused_mel_mfcc(fp, x, tile=16, interpret=True, algo="fs4")
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        1e-4 * np.max(np.abs(mel_ref)))
    assert np.max(np.abs(np.asarray(cc) - cc_ref)) <= (
        1e-4 * np.max(np.abs(cc_ref)))


def test_fused_fs4_odd_frames_and_single_tile():
    """fs4 pads odd frame counts (pairs) and supports single-tile mode."""
    plan = MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                          slide_length=512)
    T = 23
    n = T * 512 + 2048 - 512
    x = (np.random.default_rng(4).standard_normal((1, n)) * 0.2
         ).astype(np.float32)
    mel_ref, _ = _ref(plan, x)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:13], 512)
    mel, _ = fused_mel_mfcc(fp, x, tile=1000, interpret=True, algo="fs4")
    assert mel.shape == mel_ref.shape
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        1e-4 * np.max(np.abs(mel_ref)))


@pytest.mark.parametrize("wt,m_taps", [
    ("RECT", 0), ("BLACKMAN", 2), ("BLACKMAN_HARRIS", 3),
    ("BLACKMAN_NUTTALL", 3), ("FLATTOP", 4)])
def test_fused_fs4_cosine_sum_windows(wt, m_taps):
    """fs4's spectral window stencil covers the whole cosine-sum family,
    one tap pair per cosine order (blackman M=2 ... flattop M=4)."""
    from audioflux_tpu.types import WindowType
    plan = MelSpectrogram(num=64, samplate=32000, radix2_exp=11,
                          slide_length=512, window_type=WindowType[wt])
    T = 16
    n = T * 512 + 2048 - 512
    x = (np.random.default_rng(7).standard_normal((2, n)) * 0.2
         ).astype(np.float32)
    mel_ref, cc_ref = _ref(plan, x, cc_num=5)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:5], 512)
    assert fp.fs4_ok and len(fp.fsk_taps) == m_taps + 1
    mel, cc = fused_mel_mfcc(fp, x, tile=8, interpret=True, algo="fs4")
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        1e-4 * np.max(np.abs(mel_ref)))
    assert np.max(np.abs(np.asarray(cc) - cc_ref)) <= (
        1e-4 * np.max(np.abs(cc_ref)))


def test_fused_fs4_cosine_sum_small_fft():
    """blackman at fft=1024 (Q=8): taps wrap k1 across the block edge."""
    from audioflux_tpu.types import WindowType
    plan = MelSpectrogram(num=64, samplate=32000, radix2_exp=10,
                          slide_length=128,
                          window_type=WindowType.BLACKMAN)
    T = 32
    n = T * 128 + 1024 - 128
    x = (np.random.default_rng(8).standard_normal(n) * 0.2
         ).astype(np.float32)
    mel_ref, _ = _ref(plan, x, cc_num=5)
    fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:5], 128)
    assert fp.fs4_ok and len(fp.fsk_taps) == 3
    mel, _ = fused_mel_mfcc(fp, x, tile=32, interpret=True, algo="fs4")
    assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
        1e-4 * np.max(np.abs(mel_ref)))


def test_fused_auto_config_fuzz():
    """Property check: the auto-dispatched fused kernel matches the exact
    XLA path across a grid of (fft, slide, window, num, cc, batch) configs
    — whichever kernel variant 'auto' picks for each."""
    from audioflux_tpu.types import WindowType
    rng = np.random.default_rng(11)
    cases = [
        (9, 128, "HANN", 32, 5, 1),
        (10, 256, "HAMM", 64, 13, 2),
        (10, 512, "BLACKMAN", 48, 7, 1),
        (11, 1024, "HANN", 128, 13, 1),
        (12, 1024, "BLACKMAN_HARRIS", 96, 13, 1),
        (11, 2048, "RECT", 64, 5, 2),
    ]
    for r2e, slide, wt, num, cc, b in cases:
        plan = MelSpectrogram(num=num, samplate=32000, radix2_exp=r2e,
                              slide_length=slide,
                              window_type=WindowType[wt])
        T = 16
        n = T * slide + (1 << r2e) - slide
        x = (rng.standard_normal((b, n)) * 0.2).astype(np.float32)
        mel_ref, cc_ref = _ref(plan, x, cc_num=cc)
        fp = FusedMelPlan(plan.window, plan.filter_bank, plan._dct[:cc],
                          slide)
        mel, ccs = fused_mel_mfcc(fp, x, tile=8, interpret=True)
        lbl = f"{r2e}/{slide}/{wt}"
        assert np.max(np.abs(np.asarray(mel) - mel_ref)) <= (
            2e-4 * np.max(np.abs(mel_ref))), lbl
        assert np.max(np.abs(np.asarray(ccs) - cc_ref)) <= (
            2e-4 * np.max(np.abs(cc_ref))), lbl
