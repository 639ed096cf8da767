"""PWT parity vs reference C goldens."""

import numpy as np

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.pwt import PWT
from audioflux_tpu.types import SpectralFilterBankScaleType as S


def test_pwt_octave(goldens, signals):
    g = goldens("pwt")
    obj = PWT(num=84, radix2_exp=12, samplate=32000, scale_type=S.OCTAVE)
    np.testing.assert_allclose(obj.get_fre_band_arr(), g["oct_fre"],
                               rtol=1e-5, atol=1e-2)
    C = np.asarray(obj.pwt(signals["chord"][:4096]))
    ref = g["oct_re"] + 1j * g["oct_im"]
    assert_close_to_golden(C.real, ref.real, 2e-4, "oct_re")
    assert_close_to_golden(C.imag, ref.imag, 2e-4, "oct_im")


def test_pwt_mel(goldens, signals):
    g = goldens("pwt")
    obj = PWT(num=64, radix2_exp=12, samplate=32000, scale_type=S.MEL)
    C = np.asarray(obj.pwt(signals["chord"][:4096]))
    ref = g["mel_re"] + 1j * g["mel_im"]
    assert_close_to_golden(C.real, ref.real, 2e-4, "mel_re")
    assert_close_to_golden(C.imag, ref.imag, 2e-4, "mel_im")
