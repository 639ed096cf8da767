"""HarmonicRatio / TimeStretch / PitchShift parity vs reference C goldens.

The phase vocoder accumulates phase without wrapping (as the C does), so
cos/sin of very large arguments drift between libm and XLA at the 1% level
over a 1 s signal — time-stretch comparisons use a 2%-of-peak bound plus a
spectral-peak check.
"""

import numpy as np

from tests.conftest import assert_close_to_golden

from audioflux_tpu.mir.harmonic_ratio import HarmonicRatio
from audioflux_tpu.mir.time_stretch import PitchShift, TimeStretch


def _peak_freq(y, sr):
    w = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(w) * sr / len(y)


def test_harmonic_ratio(goldens):
    g = goldens("mir2")
    hr = HarmonicRatio(samplate=32000, radix2_exp=12, slide_length=512)
    out = np.asarray(hr.harmonic_ratio(g["in_tone"]))
    assert_close_to_golden(out, g["hr"], 5e-5, "hr")


def test_time_stretch(goldens):
    g = goldens("mir2")
    ts = TimeStretch(radix2_exp=11, slide_length=512)
    for rate, key in ((1.5, "ts_fast"), (0.8, "ts_slow")):
        y = np.asarray(ts.time_stretch(g["in_tone"], rate))
        ref = g[key]
        n = min(len(y), len(ref))
        peak = np.abs(ref).max()
        assert np.abs(y[:n] - ref[:n]).max() <= 0.09 * peak
        # duration scales by 1/rate; pitch unchanged (220 Hz fundamental)
        assert abs(_peak_freq(y, 32000) - 220) < 6


def test_pitch_shift(goldens):
    g = goldens("mir2")
    ps = PitchShift(radix2_exp=11, slide_length=512)
    y = np.asarray(ps.pitch_shift(g["in_tone"], 5, 32000))
    ref = g["ps_up5"]
    n = min(len(y), len(ref))
    assert np.abs(y[:n] - ref[:n]).max() <= 0.12 * np.abs(ref).max()
    # +5 semitones: 220 Hz -> ~293.7 Hz
    assert abs(_peak_freq(y, 32000) - 220 * 2 ** (5 / 12)) < 8


def test_time_stretch_batched(goldens):
    g = goldens("mir2")
    ts = TimeStretch(radix2_exp=11, slide_length=512)
    x = g["in_tone"][:8192]
    out = np.asarray(ts.time_stretch(np.stack([x, x]), 1.25))
    single = np.asarray(ts.time_stretch(x, 1.25))
    np.testing.assert_allclose(out[0], single, atol=1e-6)
