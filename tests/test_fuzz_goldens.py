"""Randomized BFT parameter-space parity vs the reference C.

36 seeded-random configurations across scale x style x norm x window x
fft x slide x data-type (``tools/gen_goldens.py`` ``fuzz_bft`` group,
seed 20260818).  The fixed-case goldens pin known configurations; these
catch regressions off the beaten path (odd slides, small ffts, every
window, style/norm combinations).
"""

import json

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.bft import BFT
from audioflux_tpu.types import (SpectralDataType,
                                 SpectralFilterBankNormalType,
                                 SpectralFilterBankScaleType,
                                 SpectralFilterBankStyleType, WindowType)

N_CASES = 36
N_CQT_CASES = 16


@pytest.mark.parametrize("i", range(N_CASES))
def test_fuzz_bft_case(goldens, signals, i):
    g = goldens("fuzz_bft")
    p = json.loads(str(g[f"c{i}_params"]))
    x = signals["sine"][:8000]
    bft = BFT(num=p["num"], radix2_exp=p["r2e"], samplate=32000,
              low_fre=p["low"], high_fre=p["high"],
              bin_per_octave=p["bpo"],
              window_type=WindowType(p["window"]),
              slide_length=p["slide"],
              scale_type=SpectralFilterBankScaleType(p["scale"]),
              style_type=SpectralFilterBankStyleType(p["style"]),
              normal_type=SpectralFilterBankNormalType(p["norm"]),
              data_type=SpectralDataType(p["data"]))
    out = np.abs(np.asarray(bft.bft(x, result_type=1)))
    assert_close_to_golden(out, g[f"c{i}_arr"], 2e-4, f"fuzz_bft[{i}] {p}")
    np.testing.assert_allclose(np.asarray(bft.get_fre_band_arr(), np.float32),
                               g[f"c{i}_fre"], rtol=2e-5, atol=2e-3,
                               err_msg=f"fuzz_bft[{i}] fre {p}")


@pytest.mark.parametrize("i", range(N_CQT_CASES))
def test_fuzz_cqt_case(goldens, signals, i):
    from audioflux_tpu.transforms.cqt import CQT
    g = goldens("fuzz_cqt")
    p = json.loads(str(g[f"c{i}_params"]))
    x = signals["sine"]
    obj = CQT(num=p["num"], samplate=32000, low_fre=p["low"],
              bin_per_octave=p["bpo"], factor=p["factor"], beta=p["beta"],
              thresh=p["thresh"], window_type=WindowType(p["window"]),
              normal_type=SpectralFilterBankNormalType(p["normal"]),
              is_scale=p["is_scale"])
    mag = np.abs(np.asarray(obj.cqt(x)))
    # the 7-octave multirate chain accumulates resampler drift; matches
    # the fixed-case cqt golden tolerance
    assert_close_to_golden(mag, g[f"c{i}_mag"], 5e-4, f"fuzz_cqt[{i}] {p}")
    np.testing.assert_allclose(np.asarray(obj.get_fre_band_arr(), np.float32),
                               g[f"c{i}_fre"], rtol=2e-5, atol=2e-3,
                               err_msg=f"fuzz_cqt[{i}] fre {p}")


N_NSGT_CASES = 12


@pytest.mark.parametrize("i", range(N_NSGT_CASES))
def test_fuzz_nsgt_case(goldens, signals, i):
    from audioflux_tpu.transforms.nsgt import NSGT, NSGTFilterBankType
    g = goldens("fuzz_nsgt")
    p = json.loads(str(g[f"c{i}_params"]))
    x = signals["sine"][:1 << p["r2e"]]
    obj = NSGT(num=p["num"], radix2_exp=p["r2e"], samplate=32000,
               low_fre=p["low"], high_fre=p["high"],
               bin_per_octave=p["bpo"], min_len=p["min_len"],
               nsgt_filter_bank_type=NSGTFilterBankType(p["bank"]),
               scale_type=SpectralFilterBankScaleType(p["scale"]),
               style_type=SpectralFilterBankStyleType(p["style"]),
               normal_type=SpectralFilterBankNormalType(p["norm"]))
    mag = np.abs(np.asarray(obj.nsgt(x)))
    assert_close_to_golden(mag, g[f"c{i}_mag"], 2e-4, f"fuzz_nsgt[{i}] {p}")
    np.testing.assert_array_equal(
        np.asarray(obj.get_time_length_arr(), np.int64), g[f"c{i}_lens"],
        err_msg=f"fuzz_nsgt[{i}] lens {p}")
    np.testing.assert_allclose(np.asarray(obj.get_fre_band_arr(), np.float32),
                               g[f"c{i}_fre"], rtol=2e-5, atol=2e-3,
                               err_msg=f"fuzz_nsgt[{i}] fre {p}")


N_DWT_CASES = 51
N_WAVELET_CASES = 14  # 6 CWT gamma/beta variations + 8 PWT scale/style/norm


@pytest.mark.parametrize("name", ["blocks", "sparse"])
def test_fuzz_edge_arr(goldens, name):
    """Non-contiguous set_edge_arr band subsets vs the C."""
    from audioflux_tpu.features.spectral import Spectral
    g = goldens("fuzz_edges")
    spec = g["in_spec"]
    sp = Spectral(128, g["in_fre"])
    sp.set_edge_arr(g[f"{name}_idx"].astype(np.int64))
    for feat, kw in (("centroid", {}), ("spread", {}), ("hfc", {}),
                     ("rms", {}), ("flux", {}),
                     ("entropy", {"is_norm": True}), ("eef", {})):
        ours = np.asarray(getattr(sp, feat)(spec, **kw))
        assert_close_to_golden(ours, g[f"{name}_{feat}"], 2e-4,
                               f"edge_{name}_{feat}")
    v, f = sp.max(spec)
    assert_close_to_golden(np.asarray(v), g[f"{name}_max_v"], 2e-4,
                           f"edge_{name}_max_v")
    assert_close_to_golden(np.asarray(f), g[f"{name}_max_f"], 2e-4,
                           f"edge_{name}_max_f")


@pytest.mark.parametrize("i", range(N_WAVELET_CASES))
def test_fuzz_wavelet_case(goldens, signals, i):
    from audioflux_tpu.transforms.cwt import CWT
    from audioflux_tpu.transforms.pwt import PWT
    from audioflux_tpu.types import WaveletContinueType
    g = goldens("fuzz_wavelet")
    p = json.loads(str(g[f"c{i}_params"]))
    S = SpectralFilterBankScaleType
    if "wavelet" in p:
        x = signals["sine"][:1 << p["r2e"]]
        obj = CWT(num=p["num"], radix2_exp=p["r2e"], samplate=32000,
                  low_fre=p.get("low"), high_fre=p.get("high"),
                  wavelet_type=getattr(WaveletContinueType, p["wavelet"]),
                  scale_type=getattr(S, p["scale"]),
                  gamma=p["gamma"], beta=p["beta"])
        C = np.asarray(obj.cwt(x))
    else:
        x = signals["sine"][:4096]
        obj = PWT(num=p["num"], radix2_exp=12, samplate=32000,
                  low_fre=p.get("low"), high_fre=p.get("high"),
                  scale_type=getattr(S, p["scale"]),
                  style_type=getattr(SpectralFilterBankStyleType,
                                     p["style"]),
                  normal_type=getattr(SpectralFilterBankNormalType,
                                      p["norm"]))
        C = np.asarray(obj.pwt(x))
    ref = g[f"c{i}_re"] + 1j * g[f"c{i}_im"]
    assert_close_to_golden(C.real, ref.real, 2e-4, f"fuzz_wave[{i}] re {p}")
    assert_close_to_golden(C.imag, ref.imag, 2e-4, f"fuzz_wave[{i}] im {p}")
    np.testing.assert_allclose(np.asarray(obj.get_fre_band_arr(), np.float32),
                               g[f"c{i}_fre"], rtol=2e-5, atol=2e-3,
                               err_msg=f"fuzz_wave[{i}] fre {p}")


@pytest.mark.parametrize("i", range(N_DWT_CASES))
def test_dwt_every_wavelet(goldens, signals, i):
    """Full coef-table sweep: 5-level DWT vs the C for all 51 wavelets."""
    from audioflux_tpu.transforms.dwt import DWT
    from audioflux_tpu.types import WaveletDiscreteType
    g = goldens("fuzz_dwt")
    wt, t1, t2, name = str(g[f"c{i}_params"]).split(",")
    x = signals["sine"][:1024]
    obj = DWT(num=5, radix2_exp=10, samplate=32000,
              wavelet_type=WaveletDiscreteType(int(wt)),
              t1=int(t1), t2=int(t2))
    coef, m = obj.dwt(x)
    assert_close_to_golden(np.asarray(coef), g[f"c{i}_coef"], 5e-5,
                           f"dwt_{name}_coef")
    assert_close_to_golden(np.asarray(m), g[f"c{i}_m"], 5e-5,
                           f"dwt_{name}_m")
