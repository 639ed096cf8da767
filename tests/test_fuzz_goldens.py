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


@pytest.mark.parametrize("i", range(5))
def test_fuzz_reassign_case(goldens, signals, i):
    from audioflux_tpu.transforms.reassign import Reassign
    from audioflux_tpu.types import ReassignType
    g = goldens("fuzz_reassign")
    p = json.loads(str(g[f"c{i}_params"]))
    x = signals["sine"][:8192]
    rs = Reassign(radix2_exp=p["r2e"], samplate=32000,
                  window_type=getattr(WindowType, p["window"]),
                  slide_length=p["slide"],
                  re_type=getattr(ReassignType, p["re_type"]),
                  thresh=0.001, is_padding=p["pad"])
    D = np.asarray(rs.reassign(x))
    ref = g[f"c{i}_re"] + 1j * g[f"c{i}_im"]
    # the reassignment index is roundf() of a float32 phrase; a source
    # cell landing within a libm-ulp of a .5 boundary may flip into the
    # neighboring band vs the C (cross-libm, same class as the
    # documented phase-vocoder drift).  Allow a handful of flips but
    # require everything else exact and scattered mass conserved.
    peak = np.abs(ref).max()
    bad = np.abs(D - ref) > 2e-4 * peak
    assert bad.mean() < 1e-3, (
        f"reassign[{i}] {p}: {bad.sum()} cells differ")
    np.testing.assert_allclose(D.sum(), ref.sum(), rtol=2e-4,
                               atol=2e-4 * peak,
                               err_msg=f"reassign[{i}] mass {p}")


def test_fuzz_synsq_order2(goldens):
    """Order-2 index composition vs the C golden.

    Cellwise exactness is unattainable here: the reassignment index is
    round() of a log2f-based phrase computed in float32, and on steady
    tones the phase rate sits constant for long stretches — one libm-ulp
    difference at a rounding boundary flips whole runs of cells into the
    neighboring band (same cross-libm class as the documented
    phase-vocoder drift).  The order-composition SEMANTICS (the C's
    flat (time,num)-reinterpreted gather, verified line-by-line against
    synsq_algorithm.c:221-240) are asserted by requiring the scatter to
    bit-match on >99.5% of cells with bounded total energy error.
    """
    from audioflux_tpu.transforms.synsq import Synsq
    g = goldens("fuzz_reassign")
    C = g["synsq2_in_re"] + 1j * g["synsq2_in_im"]
    sq = Synsq(num=84, radix2_exp=12, samplate=32000, order=2,
               thresh=0.001)
    R = np.asarray(sq.synsq(C, SpectralFilterBankScaleType.OCTAVE,
                            g["synsq2_fre"]))
    ref = g["synsq2_re"] + 1j * g["synsq2_im"]
    frac_exact = np.mean(np.abs(R - ref) <= 1e-6)
    rel_l2 = np.linalg.norm(R - ref) / np.linalg.norm(ref)
    assert frac_exact > 0.995, f"only {frac_exact:.4%} cells match"
    assert rel_l2 < 0.05, f"rel L2 {rel_l2:.3e}"
    # and it must really be the order-2 result, not order-1
    sq1 = Synsq(num=84, radix2_exp=12, samplate=32000, order=1,
                thresh=0.001)
    R1 = np.asarray(sq1.synsq(C, SpectralFilterBankScaleType.OCTAVE,
                              g["synsq2_fre"]))
    assert (np.linalg.norm(R1 - ref) > 3 * np.linalg.norm(R - ref))


@pytest.mark.parametrize("nt", ["FLUX", "HFC", "SD", "SF", "MKL",
                                "BROADBAND", "PD", "WPD", "NWPD", "CD",
                                "RCD"])
def test_fuzz_onset_every_novelty(goldens, nt):
    """Onset end-to-end (novelty -> normalize -> peak-pick) per type."""
    from audioflux_tpu.mir.onset import Onset
    from audioflux_tpu.types import NoveltyType
    g = goldens("fuzz_onset")
    phase_based = nt in ("PD", "WPD", "NWPD", "CD", "RCD")
    spec = g["mag"] if phase_based else g["spec"]
    on = Onset(time_length=spec.shape[-1], fre_length=spec.shape[0],
               slide_length=512, samplate=32000,
               novelty_type=getattr(NoveltyType, nt))
    pts, env, _ = on.onset(spec, g["phase"] if phase_based else None)
    assert_close_to_golden(np.asarray(env), g[f"{nt}_env"], 2e-4,
                           f"onset_{nt}_env")
    np.testing.assert_array_equal(np.asarray(pts, np.int64),
                                  g[f"{nt}_points"],
                                  err_msg=f"onset_{nt}_points")


@pytest.mark.parametrize("i", range(4))
def test_fuzz_harmonic_count(goldens, i):
    from audioflux_tpu.mir.harmonic import Harmonic
    g = goldens("fuzz_harmonic")
    p = json.loads(str(g[f"h{i}_params"]))
    h = Harmonic(radix2_exp=p["r2e"], samplate=32000,
                 slide_length=p["slide"],
                 window_type=getattr(WindowType, p["window"]),
                 low_fre=p["low"], high_fre=p["high"])
    counts = np.asarray(h.harmonic_count(g["in_tone"], *p["q"]), np.int64)
    np.testing.assert_array_equal(counts, g[f"h{i}_counts"],
                                  err_msg=f"fuzz_harmonic[{i}] {p}")


@pytest.mark.parametrize("i", range(3))
def test_fuzz_harmonic_ratio(goldens, i):
    # the C never reads HarmonicRatio's windowType (README deviation 8);
    # HAMM — its hardcoded choice — is the comparable configuration
    from audioflux_tpu.mir.harmonic_ratio import HarmonicRatio
    g = goldens("fuzz_harmonic")
    p = json.loads(str(g[f"r{i}_params"]))
    hr = HarmonicRatio(samplate=32000, radix2_exp=p["r2e"],
                       window_type=WindowType.HAMM,
                       slide_length=p["slide"])
    out = np.asarray(hr.harmonic_ratio(g["in_tone"]))
    assert_close_to_golden(out, g[f"r{i}_hr"], 5e-5, f"fuzz_hr[{i}] {p}")


@pytest.mark.parametrize("i", range(10))
def test_fuzz_pitch_case(goldens, i):
    """Pitch classes under non-default fft/slide/range parameters."""
    from audioflux_tpu.mir.pitch import (PitchCEP, PitchHPS, PitchLHS,
                                         PitchNCF, PitchPEF)
    from audioflux_tpu.mir.pitch_stft import PitchSTFT
    from audioflux_tpu.mir.pitch_yin import PitchYIN
    classes = dict(PitchYIN=PitchYIN, PitchNCF=PitchNCF, PitchCEP=PitchCEP,
                   PitchHPS=PitchHPS, PitchLHS=PitchLHS, PitchPEF=PitchPEF,
                   PitchSTFT=PitchSTFT)
    g = goldens("fuzz_pitch")
    p = json.loads(str(g[f"c{i}_params"]))
    sr = 32000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
            + 0.12 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    kw = dict(p.get("kw", {}))
    if "window_type" in kw:
        kw["window_type"] = getattr(WindowType, kw["window_type"])
    obj = classes[p["cls"]](samplate=sr, low_fre=p["low"],
                            high_fre=p["high"], radix2_exp=p["r2e"],
                            slide_length=p["slide"], **kw)
    res = obj.pitch(tone)
    fre = np.asarray(res[0] if isinstance(res, tuple) else res)
    np.testing.assert_allclose(fre, g[f"c{i}_fre"], atol=1e-3,
                               err_msg=f"fuzz_pitch[{i}] {p}")


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


N_WPT_SWT_CASES = 12


@pytest.mark.parametrize("i", range(N_WPT_SWT_CASES))
def test_fuzz_wpt_swt_case(goldens, signals, i):
    """WPT/SWT parameter sweep (wavelet family x depth x length) vs the
    reference wrappers — the fixed dwt-group goldens only cover the
    default sym4 at one depth/length."""
    from audioflux_tpu.transforms.dwt import SWT, WPT
    from audioflux_tpu.types import WaveletDiscreteType
    g = goldens("fuzz_wpt")
    kind, num, sz, wt, t1, t2, name = str(g[f"c{i}_params"]).split(",")
    num, sz, wt, t1, t2 = int(num), int(sz), int(wt), int(t1), int(t2)
    if kind == "wpt":
        x = signals["sine"][:1 << sz]
        obj = WPT(num=num, radix2_exp=sz,
                  wavelet_type=WaveletDiscreteType(wt), t1=t1, t2=t2)
        coef, m = obj.wpt(x)
        assert_close_to_golden(np.asarray(coef), g[f"c{i}_coef"], 5e-5,
                               f"wpt_{name}_coef")
        assert_close_to_golden(np.asarray(m), g[f"c{i}_m"], 5e-5,
                               f"wpt_{name}_m")
    else:
        x = signals["sine"][:sz]
        obj = SWT(num=num, fft_length=sz,
                  wavelet_type=WaveletDiscreteType(wt), t1=t1, t2=t2)
        a, d = obj.swt(x)
        assert_close_to_golden(np.asarray(a), g[f"c{i}_a"], 5e-5,
                               f"swt_{name}_a")
        assert_close_to_golden(np.asarray(d), g[f"c{i}_d"], 5e-5,
                               f"swt_{name}_d")


@pytest.mark.parametrize("i", range(6))
def test_fuzz_chroma_case(goldens, i):
    """chroma_linear / chroma_cqt one-shots under varied parameters.

    chroma_octave is untestable against the reference: its one-shot
    corrupts the C heap even at default parameters on this box.
    """
    import audioflux_tpu as af
    g = goldens("fuzz_chroma")
    p = json.loads(str(g[f"c{i}_params"]))
    sr = 32000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 261.63 * t)
         + 0.3 * np.sin(2 * np.pi * 392.0 * t)
         + 0.02 * np.random.default_rng(9).standard_normal(sr)
         ).astype(np.float32)  # matches gen_goldens._chroma_fuzz_signal
    arr = np.asarray(getattr(af, p["fn"])(x, samplate=32000, **p["kw"]))
    assert_close_to_golden(arr, g[f"c{i}_arr"], 5e-4,
                           f"fuzz_chroma[{i}] {p}")


@pytest.mark.parametrize("i", range(14))
def test_fuzz_core_oneshot(goldens, signals, i):
    """Every core.py one-shot vs the reference one-shot (not just the
    underlying class): the wrapper bodies hide their own quirks — the
    reference's cqt/vqt return |C|, cqcc feeds |C|^2, chroma_cqt squares
    the complex matrix."""
    import audioflux_tpu as af
    g = goldens("fuzz_core")
    p = json.loads(str(g[f"c{i}_params"]))
    x = signals["sine"]
    arr, fre = getattr(af, p["fn"])(x, samplate=32000, **p["kw"])
    arr = np.asarray(arr)
    tol = 5e-4 if p["fn"] in ("cqcc", "cqt", "vqt") else 2e-4
    assert_close_to_golden(arr, g[f"c{i}_arr"], tol,
                           f"fuzz_core[{i}] {p}")
    np.testing.assert_allclose(np.asarray(fre, np.float32), g[f"c{i}_fre"],
                               rtol=2e-5, atol=2e-3,
                               err_msg=f"fuzz_core[{i}] fre {p}")


def test_fuzz_feature_extractor(goldens, signals):
    """FeatureExtractor facade end-to-end vs the reference facade."""
    from audioflux_tpu.features.extractor import FeatureExtractor
    g = goldens("fuzz_extractor")
    x = signals["sine"][:8192]
    fe = FeatureExtractor(transforms=["bft", "cwt", "pwt"], num=64,
                          radix2_exp=11, samplate=32000, slide_length=512,
                          scale_type=SpectralFilterBankScaleType.MEL)
    spec_res = fe.spectrogram(x)
    # the reference FeatureResult is list-like (one entry per input
    # clip), hence the goldens' leading 1 — compare content
    for name in ("bft", "cwt", "pwt"):
        arr = np.asarray(spec_res[name]["spectrogram"])
        ref = (g[f"{name}_re"] + 1j * g[f"{name}_im"])[0]
        assert_close_to_golden(arr.real, ref.real, 5e-4, f"fe_{name}_re")
        assert_close_to_golden(arr.imag, ref.imag, 5e-4, f"fe_{name}_im")
    sp = fe.spectral(spec_res, spectral="flux")
    for name in ("bft", "cwt", "pwt"):
        assert_close_to_golden(np.asarray(sp[name]["flux"]),
                               g[f"{name}_flux"][0], 5e-4,
                               f"fe_{name}_flux")
    cc = fe.xxcc(spec_res, cc_num=13)
    for name in ("bft", "cwt", "pwt"):
        assert_close_to_golden(np.asarray(cc[name]["xxcc"]),
                               g[f"{name}_cc"][0], 5e-4, f"fe_{name}_cc")


@pytest.mark.parametrize("i", range(6))
def test_fuzz_resample_presets(goldens, signals, i):
    """Resample quality presets (BEST/MID/FAST) x ratios vs the C.

    Small-p ratios agree to ~1e-5; 32k->44.1k (p=441) carries the
    documented float32 phase-jitter deviation (README deviation 7), so
    its tolerance is the documented ~4e-3 bound.
    """
    from audioflux_tpu.dsp.resample import Resample
    from audioflux_tpu.types import ResampleQualityType
    g = goldens("fuzz_resample")
    p = json.loads(str(g[f"c{i}_params"]))
    x = signals["sine"][:9000]
    rs = Resample(getattr(ResampleQualityType, p["q"]),
                  is_scale=p["is_scale"])
    rs.set_samplate(p["src"], p["dst"])
    y = np.asarray(rs.resample(x))
    tol = 4e-3 if p["dst"] == 44100 else 3e-5
    assert_close_to_golden(y, g[f"c{i}_y"], tol, f"fuzz_resample[{i}] {p}")


def test_fuzz_every_utility(goldens):
    """Every pure-Python utility vs the reference wrapper's output."""
    from audioflux_tpu import utils as U
    g = goldens("fuzz_utils")
    spec = g["in_spec"]
    D = g["in_d_re"] + 1j * g["in_d_im"]
    fre = g["in_fre"]
    midi = np.arange(21, 109, dtype=np.float32)

    def close(ours, key, tol=1e-5):
        np.testing.assert_allclose(np.asarray(ours, np.float64),
                                   np.asarray(g[key], np.float64),
                                   rtol=tol, atol=tol,
                                   err_msg=key)

    close(U.power_to_db(spec), "power_to_db")
    close(U.power_to_db(spec, min_db=-40), "power_to_db_m40")
    close(U.power_to_abs_db(spec), "power_to_abs_db")
    close(U.power_to_abs_db(spec, fft_length=2048, is_norm=True),
          "power_to_abs_db_norm")
    close(U.mag_to_abs_db(spec), "mag_to_abs_db")
    close(U.log_compress(spec, gamma=5.0), "log_compress")
    close(U.log10_compress(spec, gamma=5.0), "log10_compress")
    tdb = U.temproal_db(spec[0], base=18.0)
    close(tdb[0], "temproal_db")
    close(tdb[1], "temproal_db_energy")
    close(U.delta(spec, order=9), "delta_9")
    close(U.delta(spec, order=5), "delta_5")
    close(U.get_phase(D), "get_phase")
    close(U.midi_to_hz(midi), "midi_to_hz")
    close(U.hz_to_midi(fre), "hz_to_midi")
    close([U.note_to_midi(n) for n in ("C1", "A4", "G#3", "Bb5", "F#2")],
          "note_vals")
    close(U.min_max_scale(spec), "min_max")
    close(U.stand_scale(spec), "stand")
    close(U.max_abs_scale(spec), "max_abs")
    close(U.robust_scale(spec), "robust")
    close(U.center_scale(spec), "center")
    close(U.mean_scale(spec), "mean")
    close(U.arctan_scale(spec), "arctan")
    close(U.auditory_weight_a(fre), "wa", 1e-4)
    close(U.auditory_weight_b(fre), "wb", 1e-4)
    close(U.auditory_weight_c(fre), "wc", 1e-4)
    close(U.auditory_weight_d(fre), "wd", 1e-4)
    close(U.queue_fre2(220.0, 446.0), "qf2")
    close(U.queue_fre3(220.0, 446.0, 655.0), "qf3")


# --- feature/aux-transform parameter sweep (fuzz_features group) ---------

N_FEAT_CASES = 14


@pytest.mark.parametrize("i", range(N_FEAT_CASES))
def test_fuzz_features_case(goldens, signals, i):
    """xxcc/deconv/temporal/cepstrogram/st/fst off their fixed-golden
    configurations (num, cc_num, rectify, delta window, frame/slide,
    window type, cep_num, index ranges, factor/norm)."""
    g = goldens("fuzz_features")
    p = json.loads(str(g[f"c{i}_params"]))
    kind = p["kind"]
    x = signals["chord"]
    tag = f"fuzz_features[{i}] {p}"
    if kind == "xxcc":
        from audioflux_tpu.features.xxcc import XXCC
        from audioflux_tpu.types import CepstralRectifyType
        xx = XXCC(num=p["num"])
        out = np.asarray(xx.xxcc(
            g[f"c{i}_in_spec"], cc_num=p["cc"],
            rectify_type=getattr(CepstralRectifyType, p["rectify"])))
        atol = 2e-3 if p["rectify"] == "CUBIC_ROOT" else 2e-4
        np.testing.assert_allclose(out, g[f"c{i}_arr"], atol=atol,
                                   err_msg=tag)
    elif kind == "xxcc_std":
        from audioflux_tpu.features.xxcc import XXCC
        from audioflux_tpu.types import CepstralEnergyType
        xx = XXCC(num=p["num"])
        coe, d1, d2 = xx.xxcc_standard(
            g[f"c{i}_in_spec"], g[f"c{i}_in_energy"], cc_num=p["cc"],
            delta_window_length=p["dwl"],
            energy_type=CepstralEnergyType.REPLACE)
        np.testing.assert_allclose(np.asarray(coe), g[f"c{i}_coe"],
                                   atol=2e-4, err_msg=tag)
        np.testing.assert_allclose(np.asarray(d1), g[f"c{i}_d1"],
                                   atol=2e-4, err_msg=tag)
        np.testing.assert_allclose(np.asarray(d2), g[f"c{i}_d2"],
                                   atol=2e-4, err_msg=tag)
    elif kind == "deconv":
        from audioflux_tpu.features.deconv import Deconv
        dc = Deconv(num=p["num"])
        timbre, pitch = dc.deconv(g[f"c{i}_in_spec"])
        assert_close_to_golden(timbre, g[f"c{i}_timbre"], 5e-5, tag)
        assert_close_to_golden(pitch, g[f"c{i}_pitch"], 5e-4, tag)
    elif kind == "temporal":
        from audioflux_tpu.transforms.temporal import Temporal
        tp = Temporal(frame_length=p["frame"], slide_length=p["slide"],
                      window_type=getattr(WindowType, p["window"]))
        res = tp.temporal(x, has_energy=True, has_rms=True, has_zcr=True,
                          has_m=True)
        assert_close_to_golden(res["energy_arr"], g[f"c{i}_energy"],
                               5e-5, tag)
        assert_close_to_golden(res["rms_arr"], g[f"c{i}_rms"], 5e-5, tag)
        np.testing.assert_allclose(np.asarray(res["zcr_arr"]),
                                   g[f"c{i}_zcr"], atol=1e-6, err_msg=tag)
        assert_close_to_golden(res["m_arr"], g[f"c{i}_m"], 5e-6, tag)
    elif kind == "cepstrogram":
        # runs on the noisy sine: pure tones put windowed-spectrum nulls
        # on the log(max(p,1e-16)) clamp where one FFT ulp flips the log
        # by tens of units (rounding knife edge, see gen_goldens)
        from audioflux_tpu.transforms.cepstrogram import Cepstrogram
        cp = Cepstrogram(radix2_exp=p["r2e"], samplate=32000,
                         window_type=getattr(WindowType, p["window"]),
                         slide_length=p["slide"])
        c1, c2, c3 = cp.cepstrogram(signals["sine"], cep_num=p["cep"])
        assert_close_to_golden(c1, g[f"c{i}_ceps"], 5e-5, tag)
        assert_close_to_golden(c2, g[f"c{i}_env"], 5e-5, tag)
        # details re-FFT the cepstrum (same bound as the fixed golden)
        assert_close_to_golden(c3, g[f"c{i}_det"], 2e-3, tag)
    elif kind == "st":
        from audioflux_tpu.transforms.st import ST
        st = ST(radix2_exp=p["r2e"], min_index=p["mn"], max_index=p["mx"],
                factor=p["factor"], norm=p["norm"])
        C = np.asarray(st.st(x[:1 << p["r2e"]]))
        assert_close_to_golden(C.real, g[f"c{i}_re"], 5e-5, tag)
        assert_close_to_golden(C.imag, g[f"c{i}_im"], 5e-5, tag)
    elif kind == "fst":
        from audioflux_tpu.transforms.fst import FST
        fst = FST(radix2_exp=p["r2e"], samplate=32000)
        C = np.asarray(fst.fst(x[:1 << p["r2e"]], p["mn"], p["mx"]))
        assert_close_to_golden(C.real, g[f"c{i}_re"], 5e-5, tag)
        assert_close_to_golden(C.imag, g[f"c{i}_im"], 5e-5, tag)
    else:
        raise AssertionError(f"unknown kind {kind}")


# --- MIR post-processing / classic-ML parameter sweep (fuzz_mir2) --------

N_MIR2_CASES = 14


def _peak_freq(y, sr=32000):
    w = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(w) * sr / len(y)


@pytest.mark.parametrize("i", range(N_MIR2_CASES))
def test_fuzz_mir2_case(goldens, i):
    """time_stretch/pitch_shift/HPSS/HarmonicRatio/NMF/Viterbi off their
    fixed-golden configurations.  Phase-vocoder outputs use the
    documented drift bound (unwrapped-phase cos/sin libm divergence,
    see test_mir2.py) plus pitch/duration checks."""
    g = goldens("fuzz_mir2")
    p = json.loads(str(g[f"c{i}_params"]))
    kind = p["kind"]
    tag = f"fuzz_mir2[{i}] {p}"
    sr = 32000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    if kind == "ts":
        from audioflux_tpu.mir.time_stretch import TimeStretch
        ts = TimeStretch(radix2_exp=p["r2e"], slide_length=p["slide"],
                         window_type=getattr(WindowType, p["window"]))
        y = np.asarray(ts.time_stretch(tone, p["rate"]))
        ref = g[f"c{i}_y"]
        # the C returns its full capacity buffer ceil(n/rate)+fft with
        # zeros after the real signal; ours ends at the true OLA length
        import math
        cap = math.ceil(len(tone) / p["rate"]) + (1 << p["r2e"])
        assert len(ref) == cap, tag
        n = min(len(y), len(ref))
        assert np.abs(y[:n] - ref[:n]).max() <= 0.1 * np.abs(ref).max(), tag
        assert np.abs(ref[n:]).max() <= 1e-6, tag
        assert abs(_peak_freq(y) - 220) < 6, tag
    elif kind == "ps":
        from audioflux_tpu.mir.time_stretch import PitchShift
        ps = PitchShift(radix2_exp=p["r2e"], slide_length=p["slide"],
                        window_type=getattr(WindowType, p["window"]))
        y = np.asarray(ps.pitch_shift(tone, p["semitone"], sr))
        ref = g[f"c{i}_y"]
        n = min(len(y), len(ref))
        assert np.abs(y[:n] - ref[:n]).max() <= 0.12 * np.abs(ref).max(), tag
        want = 220 * 2 ** (p["semitone"] / 12)
        assert abs(_peak_freq(y) - want) < 8, tag
    elif kind == "hpss":
        from audioflux_tpu.mir.hpss import HPSS
        hp = HPSS(radix2_exp=p["r2e"],
                  window_type=getattr(WindowType, p["window"]),
                  slide_length=p["slide"], h_order=p["h"], p_order=p["p"])
        h, perc = hp.hpss(g[f"c{i}_in_x"])
        assert_close_to_golden(h, g[f"c{i}_h"], 5e-5, tag)
        assert_close_to_golden(perc, g[f"c{i}_p"], 5e-5, tag)
    elif kind == "hr":
        from audioflux_tpu.mir.harmonic_ratio import HarmonicRatio
        hr = HarmonicRatio(samplate=sr, radix2_exp=p["r2e"],
                           slide_length=p["slide"])
        out = np.asarray(hr.harmonic_ratio(tone))
        assert_close_to_golden(out, g[f"c{i}_y"], 5e-5, tag)
    elif kind == "nmf":
        from audioflux_tpu.classic import nmf
        W, H = nmf(g[f"c{i}_V"], p["k"], w_arr=g[f"c{i}_W0"],
                   h_arr=g[f"c{i}_H0"], max_iter=p["it"], tp=p["tp"],
                   thresh=1e-5, norm=p["norm"])
        W, H = np.asarray(W), np.asarray(H)
        V = g[f"c{i}_V"]
        # multiplicative updates compound float32 differences; compare
        # factors loosely and the reconstruction quality tightly.  The
        # IS divergence (tp=2) is chaotic enough that factor paths part
        # ways entirely (measured: equal reconstruction, 0.11 factor
        # drift) — reconstruction quality is the only stable contract.
        if p["tp"] < 2:
            np.testing.assert_allclose(W, g[f"c{i}_W"], atol=5e-2,
                                       err_msg=tag)
        rec_ours = np.abs(V - W @ H).mean()
        rec_ref = np.abs(V - g[f"c{i}_W"] @ g[f"c{i}_H"]).mean()
        assert rec_ours <= rec_ref * 1.05, tag
    elif kind == "viterbi":
        from audioflux_tpu.classic import viterbi
        s, prob, m = viterbi(g[f"c{i}_pi"], g[f"c{i}_A"], g[f"c{i}_B"],
                             g[f"c{i}_o"])
        np.testing.assert_array_equal(np.asarray(s), g[f"c{i}_vit_s"],
                                      err_msg=tag)
        np.testing.assert_allclose(float(prob), g[f"c{i}_vit_prob"],
                                   rtol=1e-4, err_msg=tag)
        np.testing.assert_allclose(np.asarray(m), g[f"c{i}_vit_m"],
                                   rtol=1e-4, atol=1e-12, err_msg=tag)
    else:
        raise AssertionError(f"unknown kind {kind}")


# --- spectral-feature parameter sweep (fuzz_spectral group) ---------------

N_SPECTRAL_FUZZ = 10

_SPECTRAL_PLAIN = ("flatness", "centroid", "spread", "skewness", "kurtosis",
                   "crest", "slope", "decrease", "rms", "hfc")


@pytest.mark.parametrize("i", range(N_SPECTRAL_FUZZ))
def test_fuzz_spectral_case(goldens, i):
    """Every Spectral method off its fixed-golden defaults: random
    spectrum shapes, random monotone frequency bands, contiguous edge
    windows, and randomized kwargs for each parameterized method
    (reference feature/spectral.py:120-2645)."""
    from audioflux_tpu.features.spectral import Spectral
    from audioflux_tpu.types import (SpectralNoveltyDataType,
                                     SpectralNoveltyMethodType)
    g = goldens("fuzz_spectral")
    p = json.loads(str(g[f"c{i}_params"]))
    tag = f"fuzz_spectral[{i}] {p}"
    spec = g[f"c{i}_in_spec"]
    phase = g[f"c{i}_in_phase"]
    sp = Spectral(num=p["num"], fre_band_arr=g[f"c{i}_in_fre"])
    sp.set_time_length(p["T"])
    sp.set_edge(p["start"], p["end"])
    checks = {
        "flux": sp.flux(spec, step=p["flux_step"], p=p["flux_p"],
                        is_positive=p["flux_pos"], is_exp=p["flux_exp"],
                        tp=p["flux_tp"]),
        "rolloff": sp.rolloff(spec, threshold=p["rolloff_th"]),
        "entropy": sp.entropy(spec, is_norm=p["ent_norm"]),
        "energy": sp.energy(spec, is_log=p["en_log"], gamma=p["en_gamma"]),
        "sd": sp.sd(spec, step=p["sd_step"], is_positive=p["sd_pos"]),
        "sf": sp.sf(spec, step=p["sf_step"], is_positive=p["sf_pos"]),
        "mkl": sp.mkl(spec, tp=p["mkl_tp"]),
        "broadband": sp.broadband(spec, threshold=p["bb_th"]),
        "novelty": sp.novelty(
            spec, step=p["nov_step"], threshold=p["nov_th"],
            method_type=SpectralNoveltyMethodType(p["nov_m"]),
            data_type=SpectralNoveltyDataType(p["nov_d"])),
        "eef": sp.eef(spec, is_norm=p["eef_norm"]),
        "eer": sp.eer(spec, is_norm=p["eer_norm"], gamma=p["eer_gamma"]),
    }
    for name in _SPECTRAL_PLAIN:
        checks[name] = getattr(sp, name)(spec)
    for name in ("max", "mean", "var"):
        v, f = getattr(sp, name)(spec)
        checks[f"{name}_v"], checks[f"{name}_f"] = v, f
    for name in ("pd", "wpd", "nwpd", "cd", "rcd"):
        checks[name] = getattr(sp, name)(spec, phase)
    for name, ours in checks.items():
        assert_close_to_golden(ours, g[f"c{i}_{name}"], 5e-5,
                               f"{tag} {name}")
    # band_width needs a NaN-aware check: with integer p != 2 the C sums
    # SIGNED x*(f-c)^p terms, so powf(value, 1/p) is NaN wherever the sum
    # goes negative (non-integer exponent on a negative base — we reproduce
    # the exact NaN mask).  With p == 1 the quantity is mathematically zero
    # by the centroid definition, so both sides are pure float32
    # cancellation noise; bound ours by the cancellation scale instead.
    ours = np.asarray(sp.band_width(spec, p=p["bw_p"]))
    ref = np.asarray(g[f"c{i}_band_width"])
    assert np.array_equal(np.isnan(ours), np.isnan(ref)), (
        f"{tag} band_width NaN mask mismatch")
    m = ~np.isnan(ref)
    if p["bw_p"] == 1.0:
        x = np.where(np.arange(p["num"])[:, None] >= p["start"], spec, 0)
        x = np.where(np.arange(p["num"])[:, None] <= p["end"], x, 0)
        f = g[f"c{i}_in_fre"]
        c = (f[:, None] * x).sum(0) / np.maximum(x.sum(0), 1e-20)
        cancel = (x * np.abs(f[:, None] - c)).sum(0)
        assert np.all(np.abs(ours - ref)[m] <= 1e-4 * cancel[m] + 1e-6), (
            f"{tag} band_width p=1 cancellation bound")
    elif m.any():
        peak = np.abs(ref[m]).max()
        err = np.abs(ours - ref)[m].max()
        assert err <= 5e-4 * max(peak, 1e-20), (
            f"{tag} band_width finite part: {err:.3e} vs peak {peak:.3e}")


# --- STFT/ISTFT parameter sweep (fuzz_stft group) --------------------------

N_STFT_FUZZ = 14


@pytest.mark.parametrize("i", range(N_STFT_FUZZ))
def test_fuzz_stft_case(goldens, signals, i):
    """STFT off its fixed-golden configuration: radix2_exp x all 14
    window types x slide (incl. slide == fft) x padding position/mode/
    constant values x custom window data x odd signal lengths, plus
    reconstruction through both istft methods where the overlap covers
    the signal (reference src/stft_algorithm.c stft/istft paths)."""
    from audioflux_tpu.transforms.stft import STFT
    from audioflux_tpu.types import PaddingModeType, PaddingPositionType
    g = goldens("fuzz_stft")
    p = json.loads(str(g[f"c{i}_params"]))
    tag = f"fuzz_stft[{i}] {p}"
    st = STFT(radix2_exp=p["r2e"], window_type=WindowType(p["window"]),
              slide_length=p["slide"])
    if p["custom"]:
        st.use_window_data_arr(g[f"c{i}_win"])
    if p["pad"]:
        st.enable_padding(True)
        st.set_padding(PaddingPositionType(p["pos"]),
                       PaddingModeType(p["mode"]), p["v1"], p["v2"])
    x = signals["sine"][:p["n"]]
    D = np.asarray(st.stft(x))
    assert_close_to_golden(D.real, g[f"c{i}_re"], 5e-5, tag)
    assert_close_to_golden(D.imag, g[f"c{i}_im"], 5e-5, tag)
    if f"c{i}_rec" in g.files:
        # feed the golden spectrum so the istft check is independent of
        # forward-path float ulps; tolerance is looser than the forward
        # check because both istft methods divide by overlapped window
        # sums, and windows with negative lobes or near-zero edges
        # (flattop, blackman-nuttall, ...) pass those sums near the C's
        # <1e-6 clamp where ifft ulps are amplified ~10x
        Dg = g[f"c{i}_re"] + 1j * g[f"c{i}_im"]
        y = np.asarray(st.istft(Dg, method_type=p["method"]))
        assert_close_to_golden(y, g[f"c{i}_rec"], 1e-3, tag)


# --- DSP one-shot parameter sweep (fuzz_dsp group) --------------------------

N_DSP_FUZZ = 19


@pytest.mark.parametrize("i", range(N_DSP_FUZZ))
def test_fuzz_dsp_case(goldens, i):
    """hilbert/dct/xcorr vs the C symbols across sizes and knobs; czt and
    conv vs float64 direct-definition goldens (the reference CZT's
    2N-overread makes its output undefined — documented deviation 3)."""
    g = goldens("fuzz_dsp")
    p = json.loads(str(g[f"c{i}_params"]))
    tag = f"fuzz_dsp[{i}] {p}"
    kind = p["kind"]
    if kind == "hilbert":
        from audioflux_tpu.dsp.hilbert import Hilbert
        z = np.asarray(Hilbert(radix2_exp=p["r2e"]).hilbert(g[f"c{i}_x"]))
        assert_close_to_golden(z.real, g[f"c{i}_re"], 5e-5, tag)
        assert_close_to_golden(z.imag, g[f"c{i}_im"], 5e-5, tag)
    elif kind == "dct":
        from audioflux_tpu.dsp.dct import dct
        y = dct(g[f"c{i}_x"], is_norm=bool(p["norm"]))
        assert_close_to_golden(y, g[f"c{i}_y"], 5e-5, tag)
    elif kind == "xcorr":
        from audioflux_tpu.dsp.xcorr import XcorrNormalType, xcorr
        y = None if p["auto"] else g[f"c{i}_y"]
        arr = xcorr(g[f"c{i}_x"], y, XcorrNormalType(p["norm"]))[0]
        assert_close_to_golden(arr, g[f"c{i}_arr"], 5e-5, tag)
    elif kind == "czt":
        from audioflux_tpu.dsp.czt import czt
        C = np.asarray(czt(g[f"c{i}_x"], p["low"], p["high"]))
        assert_close_to_golden(C.real, g[f"c{i}_re"], 5e-4, tag)
        assert_close_to_golden(C.imag, g[f"c{i}_im"], 5e-4, tag)
    elif kind == "conv":
        from audioflux_tpu.dsp.conv import ConvModeType, conv
        full = g[f"c{i}_y"]
        n, m = p["nx"], p["nh"]
        mode = ConvModeType(p["mode"])
        if mode == ConvModeType.FULL:
            want = full
        elif mode == ConvModeType.SAME:
            start = m // 2 - (0 if m % 2 else 1)
            want = full[start:start + n]
        else:
            want = full[m - 1:n]
        out = conv(g[f"c{i}_x"], g[f"c{i}_h"], mode)
        assert_close_to_golden(out, want, 5e-5, tag)
    else:
        raise AssertionError(f"unknown kind {kind}")


# --- Deep/DeepChroma parameter sweep (fuzz_deep group) ----------------------

N_DEEP_FUZZ = 7


@pytest.mark.parametrize("i", range(N_DEEP_FUZZ))
def test_fuzz_deep_case(goldens, signals, i):
    """Deep/DeepChroma off their fixed-golden configuration: num x
    radix2_exp x samplate x deep_order (reference
    python/audioflux/spectrogram.py:2655/2739 + spectrogramObj deep
    paths)."""
    from audioflux_tpu.transforms.deep import (DeepChromaSpectrogram,
                                               DeepSpectrogram)
    g = goldens("fuzz_deep")
    p = json.loads(str(g[f"c{i}_params"]))
    tag = f"fuzz_deep[{i}] {p}"
    ref = g[f"c{i}_arr"]
    x = signals["chord"]
    if p["kind"] == "deep":
        dp = DeepSpectrogram(num=p["num"], samplate=p["sr"],
                             radix2_exp=p["r2e"])
        if p["order"] != 1:
            dp.set_deep_order(p["order"])
        D = np.asarray(dp.spectrogram(x))
        assert D.shape == ref.shape, tag
        for ch in range(ref.shape[0]):
            assert_close_to_golden(D[ch], ref[ch], 5e-5, f"{tag} ch{ch}")
    else:
        dc = DeepChromaSpectrogram(samplate=p["sr"], radix2_exp=p["r2e"])
        assert_close_to_golden(dc.spectrogram(x), ref, 5e-5, tag)
