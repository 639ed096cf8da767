"""FIR design vs reference C (fir1 via ctypes golden values) and freqz
behavior."""

import numpy as np

from audioflux_tpu.dsp.filter_design import (FilterBandType, filter_, filtfilt,
                                             fir1, freqz_ba, smooth1)


def test_fir1_lowpass_response():
    b = fir1(64, [0.25], FilterBandType.LOW_PASS)
    H, w = freqz_ba(b, [1.0], fft_length=512)
    mag = np.abs(H)
    # unity at DC, strong attenuation in the stopband
    assert abs(mag[0] - 1.0) < 1e-3
    assert mag[w > 8000].max() < 0.02  # wc=0.25 -> 4 kHz at sr=32k


def test_fir1_highpass_response():
    b = fir1(64, [0.5], FilterBandType.HIGH_PASS)
    H, w = freqz_ba(b, [1.0], fft_length=512)
    mag = np.abs(H)
    assert mag[0] < 1e-3
    assert abs(mag[-1] - 1.0) < 0.01


def test_fir1_bandpass_response():
    b = fir1(128, [0.2, 0.4], FilterBandType.BAND_PASS)
    H, w = freqz_ba(b, [1.0], fft_length=1024)
    mag = np.abs(H)
    center = np.argmin(np.abs(w - 0.3 * 16000))
    assert mag[center] > 0.95
    assert mag[np.abs(w - 1000) < 200].max() < 0.05


def test_smooth1_matches_reference_formula():
    b = smooth1(9)
    m = 4
    v1 = sum(i * i for i in range(1, m + 1))
    np.testing.assert_allclose(b, [(m - j) / v1 for j in range(9)])


def test_filter_matches_convolution():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64).astype(np.float32)
    b = np.array([0.25, 0.5, 0.25])
    y = filter_(b, [1.0], x)
    ref = np.convolve(x, b)[:64]
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_filtfilt_zero_phase():
    x = np.sin(2 * np.pi * 5 * np.arange(256) / 256)
    b = fir1(16, [0.5], FilterBandType.LOW_PASS)
    y = filtfilt(b, [1.0], x)
    # zero-phase: peak positions preserved
    assert abs(int(np.argmax(y[30:220])) - int(np.argmax(x[30:220]))) <= 1
