"""CWT parity vs reference C goldens — all 8 mother wavelets, 3 scale types,
padded and unpadded."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.cwt import CWT
from audioflux_tpu.types import (SpectralFilterBankScaleType as S,
                                 WaveletContinueType as W)

CASES = {
    "morse_oct": dict(wavelet_type=W.MORSE, scale_type=S.OCTAVE),
    "morlet_oct": dict(wavelet_type=W.MORLET, scale_type=S.OCTAVE),
    "bump_oct": dict(wavelet_type=W.BUMP, scale_type=S.OCTAVE),
    "paul_oct": dict(wavelet_type=W.PAUL, scale_type=S.OCTAVE),
    "dog_oct": dict(wavelet_type=W.DOG, scale_type=S.OCTAVE),
    "mexican_oct": dict(wavelet_type=W.MEXICAN, scale_type=S.OCTAVE),
    "hermit_oct": dict(wavelet_type=W.HERMIT, scale_type=S.OCTAVE),
    "ricker_oct": dict(wavelet_type=W.RICKER, scale_type=S.OCTAVE),
    "morse_linear": dict(wavelet_type=W.MORSE, scale_type=S.LINEAR,
                         num=64, low_fre=100.0, high_fre=8000.0),
    "morse_mel": dict(wavelet_type=W.MORSE, scale_type=S.MEL, num=64),
    "morse_nopad": dict(wavelet_type=W.MORSE, scale_type=S.OCTAVE,
                        is_padding=False),
}


@pytest.mark.parametrize("name", list(CASES))
def test_cwt_case(goldens, signals, name):
    g = goldens("cwt")
    kw = dict(CASES[name])
    kw.setdefault("num", 84)
    obj = CWT(radix2_exp=12, samplate=32000, **kw)
    np.testing.assert_allclose(obj.get_fre_band_arr(), g[f"{name}_fre"],
                               rtol=1e-5, atol=1e-2)
    C = np.asarray(obj.cwt(signals["chord"][:4096]))
    ref = g[f"{name}_re"] + 1j * g[f"{name}_im"]
    assert_close_to_golden(C.real, ref.real, 2e-4, f"{name}_re")
    assert_close_to_golden(C.imag, ref.imag, 2e-4, f"{name}_im")


def test_cwt_batched(signals):
    obj = CWT(num=32, radix2_exp=12, samplate=32000)
    x = signals["chord"][:4096]
    out = np.asarray(obj.cwt(np.stack([x, 2 * x])))
    single = np.asarray(obj.cwt(x))
    assert out.shape == (2, 32, 4096)
    np.testing.assert_allclose(out[0], single, rtol=1e-6)


def test_cwt_det_runs(signals):
    obj = CWT(num=16, radix2_exp=10, samplate=32000)
    D = np.asarray(obj.cwt_det(signals["chord"][:1024]))
    assert D.shape == (16, 1024) and np.isfinite(D).all()
