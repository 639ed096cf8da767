"""DSP extras parity: Xcorr, Hilbert, DCT vs reference C; CZT vs the direct
zoom-DFT formula (the reference CZT has a buffer overread, see dsp/czt.py)."""

import numpy as np

from audioflux_tpu.dsp.czt import CZT
from audioflux_tpu.dsp.dct import DCT
from audioflux_tpu.dsp.hilbert import Hilbert
from audioflux_tpu.dsp.xcorr import Xcorr, XcorrNormalType


def test_xcorr(goldens):
    g = goldens("dsp")
    out, idx, val = Xcorr().xcorr(g["x"], g["y"], XcorrNormalType.COEFF)
    np.testing.assert_allclose(np.asarray(out), g["xcorr"], atol=1e-5)
    assert int(idx) == int(g["xcorr_idx"])


def test_autocorr(goldens):
    g = goldens("dsp")
    out, idx, val = Xcorr().xcorr(g["x"], xcorr_normal_type=XcorrNormalType.COEFF)
    np.testing.assert_allclose(np.asarray(out), g["autocorr"], atol=1e-5)
    assert int(idx) == 255  # zero lag for autocorrelation


def test_hilbert(goldens):
    g = goldens("dsp")
    h = Hilbert(radix2_exp=8)
    out = np.asarray(h.hilbert(g["x"]))
    np.testing.assert_allclose(out.real, g["hilb_re"], atol=1e-5)
    np.testing.assert_allclose(out.imag, g["hilb_im"], atol=1e-5)


def test_dct(goldens):
    g = goldens("dsp")
    d = DCT(64)
    out = np.asarray(d.dct(g["dct_in"], is_norm=True))
    np.testing.assert_allclose(out, g["dct_out"], atol=2e-4)
    rec = np.asarray(d.idct(out, is_norm=True))
    np.testing.assert_allclose(rec, g["dct_in"], atol=1e-4)


def test_czt_matches_direct_zoom():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(128).astype(np.float32)
    lo, hi = 0.1, 0.3
    out = np.asarray(CZT(7).czt(x, lo, hi))
    n = len(x)
    ks = lo + np.arange(n) * (hi - lo) / n
    direct = np.array([(x * np.exp(-2j * np.pi * w * np.arange(n))).sum()
                       for w in ks])
    np.testing.assert_allclose(out, direct, atol=1e-3)
