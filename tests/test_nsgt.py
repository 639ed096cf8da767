"""NSGT parity vs reference C goldens (efficient octave + standard mel)."""

import numpy as np

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.nsgt import NSGT, NSGTFilterBankType
from audioflux_tpu.types import SpectralFilterBankScaleType as S


def test_nsgt_octave(goldens, signals):
    g = goldens("nsgt")
    obj = NSGT(num=84, radix2_exp=12, samplate=32000, scale_type=S.OCTAVE)
    assert np.array_equal(obj.get_time_length_arr(), g["oct_lens"])
    np.testing.assert_allclose(obj.get_fre_band_arr(), g["oct_fre"],
                               rtol=1e-5, atol=1e-2)
    C = np.asarray(obj.nsgt(signals["chord"][:4096]))
    ref = g["oct_re"] + 1j * g["oct_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "oct_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "oct_im")


def test_nsgt_standard_mel(goldens, signals):
    g = goldens("nsgt")
    obj = NSGT(num=64, radix2_exp=12, samplate=32000, scale_type=S.MEL,
               nsgt_filter_bank_type=NSGTFilterBankType.STANDARD)
    assert np.array_equal(obj.get_time_length_arr(), g["mel_std_lens"])
    C = np.asarray(obj.nsgt(signals["chord"][:4096]))
    ref = g["mel_std_re"] + 1j * g["mel_std_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "mel_std_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "mel_std_im")


def test_nsgt_batched(signals):
    obj = NSGT(num=32, radix2_exp=11, samplate=32000, scale_type=S.OCTAVE)
    x = signals["chord"][:2048]
    out = np.asarray(obj.nsgt(np.stack([x, 0.5 * x])))
    single = np.asarray(obj.nsgt(x))
    assert out.shape[0] == 2
    np.testing.assert_allclose(out[0], single, rtol=1e-6, atol=1e-8)
