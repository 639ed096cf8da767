"""XXCC / Deconv / Temporal / Cepstrogram parity vs reference C goldens."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.features.xxcc import XXCC
from audioflux_tpu.features.deconv import Deconv
from audioflux_tpu.transforms.temporal import Temporal
from audioflux_tpu.transforms.cepstrogram import Cepstrogram
from audioflux_tpu.types import CepstralEnergyType, CepstralRectifyType


def test_xxcc(goldens):
    g = goldens("features")
    xx = XXCC(num=128)
    out = xx.xxcc(g["in_spec"], cc_num=13)
    np.testing.assert_allclose(np.asarray(out), g["xxcc"], atol=2e-4)
    out = xx.xxcc(g["in_spec"], cc_num=13,
                  rectify_type=CepstralRectifyType.CUBIC_ROOT)
    np.testing.assert_allclose(np.asarray(out), g["xxcc_cbrt"], atol=2e-3)


def test_xxcc_standard_replace(goldens):
    g = goldens("features")
    xx = XXCC(num=128)
    coe, d1, d2 = xx.xxcc_standard(g["in_spec"], g["in_energy"], cc_num=13,
                                   delta_window_length=9,
                                   energy_type=CepstralEnergyType.REPLACE)
    np.testing.assert_allclose(np.asarray(coe), g["std_coe"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(d1), g["std_d1"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(d2), g["std_d2"], atol=2e-4)


def test_xxcc_standard_append_shapes(goldens):
    # the reference C crashes in APPEND mode (wrapper under-allocates);
    # check our implementation's self-consistency instead
    g = goldens("features")
    xx = XXCC(num=128)
    coe, d1, d2 = xx.xxcc_standard(g["in_spec"], g["in_energy"], cc_num=13,
                                   delta_window_length=5,
                                   energy_type=CepstralEnergyType.APPEND)
    assert coe.shape == (14, 59) and d1.shape == (14, 59) and d2.shape == (14, 59)
    # appended row 0 is log(energy); rows 1.. are the plain xxcc
    np.testing.assert_allclose(np.asarray(coe)[0],
                               np.log(np.maximum(g["in_energy"], 1e-8)),
                               rtol=1e-6)
    plain = np.asarray(xx.xxcc(g["in_spec"], cc_num=13))
    np.testing.assert_allclose(np.asarray(coe)[1:], plain, rtol=1e-6)


def test_deconv(goldens):
    g = goldens("features")
    dc = Deconv(num=128)
    timbre, pitch = dc.deconv(g["in_spec"])
    assert_close_to_golden(timbre, g["deconv_timbre"], 5e-5, "deconv_timbre")
    assert_close_to_golden(pitch, g["deconv_pitch"], 5e-4, "deconv_pitch")


def test_temporal(goldens, signals):
    g = goldens("features")
    tp = Temporal(frame_length=2048, slide_length=512)
    e, r, z = tp.temporal(signals["chord"])
    assert_close_to_golden(e, g["temp_energy"], 5e-5, "temp_energy")
    assert_close_to_golden(r, g["temp_rms"], 5e-5, "temp_rms")
    np.testing.assert_allclose(np.asarray(z), g["temp_zcr"], atol=1e-6)
    assert_close_to_golden(tp.ezr(gamma=1.0), g["temp_ezr"], 5e-5, "temp_ezr")


def test_cepstrogram(goldens, signals):
    g = goldens("features")
    cp = Cepstrogram(radix2_exp=11, samplate=32000, slide_length=512)
    c1, c2, c3 = cp.cepstrogram(signals["chord"], cep_num=32)
    assert_close_to_golden(c1, g["ceps"], 5e-5, "ceps")
    assert_close_to_golden(c2, g["ceps_env"], 5e-5, "ceps_env")
    # details re-FFT the cepstrum: float32 error from the first pass sums
    # coherently over 2048 bins, so the bound is looser
    assert_close_to_golden(c3, g["ceps_det"], 2e-3, "ceps_det")


def test_batched_xxcc(goldens):
    g = goldens("features")
    xx = XXCC(num=128)
    batch = np.stack([g["in_spec"], g["in_spec"] * 2])
    out = np.asarray(xx.xxcc(batch, cc_num=13))
    assert out.shape == (2, 13, 59)
    np.testing.assert_allclose(out[0], g["xxcc"], atol=2e-4)
