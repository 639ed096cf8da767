"""MIR parity vs reference C goldens: YIN pitch, HPSS, onset detection."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.mir import HPSS, Onset, PitchYIN
from audioflux_tpu.types import NoveltyType, WindowType

SR = 32000


@pytest.fixture(scope="module")
def tone():
    t = np.arange(SR) / SR
    return (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_yin(goldens, tone):
    g = goldens("mir")
    yin = PitchYIN(samplate=SR, radix2_exp=12, slide_length=1024)
    fre, val = yin.pitch(tone)
    np.testing.assert_allclose(np.asarray(fre), g["yin_fre"], atol=5e-3)
    np.testing.assert_allclose(np.asarray(val), g["yin_val"], atol=1e-5)
    # the tone is 440 Hz
    assert abs(np.median(np.asarray(fre)) - 440.0) < 1.0


def test_hpss(goldens):
    g = goldens("mir")
    hp = HPSS(radix2_exp=11, window_type=WindowType.HAMM, slide_length=512,
              h_order=21, p_order=31)
    h, p = hp.hpss(g["in_x"])
    assert_close_to_golden(h, g["hpss_h"], 5e-5, "hpss_h")
    assert_close_to_golden(p, g["hpss_p"], 5e-5, "hpss_p")


def test_onset(goldens):
    g = goldens("mir")
    on = Onset(time_length=59, fre_length=128, slide_length=512, samplate=SR,
               novelty_type=NoveltyType.FLUX)
    pts, env, times = on.onset(g["onset_spec"])
    np.testing.assert_allclose(env, g["onset_env"], atol=1e-5)
    np.testing.assert_array_equal(pts, g["onset_points"])


def test_yin_batched(tone):
    yin = PitchYIN(samplate=SR, radix2_exp=12, slide_length=1024)
    fre, val = yin.pitch(np.stack([tone, tone]))
    single_fre, _ = yin.pitch(tone)
    assert np.asarray(fre).shape[0] == 2
    np.testing.assert_allclose(np.asarray(fre)[0], np.asarray(single_fre),
                               rtol=1e-6)


def test_hpss_batched(goldens):
    g = goldens("mir")
    hp = HPSS(radix2_exp=11, slide_length=512)
    h, p = hp.hpss(np.stack([g["in_x"], g["in_x"]]))
    hs, _ = hp.hpss(g["in_x"])
    np.testing.assert_allclose(np.asarray(h)[0], np.asarray(hs), atol=1e-6)
