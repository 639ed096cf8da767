"""Generate golden test fixtures from the reference C library.

Runs the reference (built from /root/reference sources into .ref/, driven via
its own ctypes wrapper staged in .ref/pkg) on deterministic synthetic signals
and writes compressed .npz fixtures into tests/goldens/. The test suite
compares audioflux_tpu outputs against these fixtures, so tests are hermetic
(no reference needed at test time).

Usage: python tools/gen_goldens.py [group ...]
Fixed groups: windows filterbanks spectrogram stft chroma cqt cwt pwt
  synsq st dwt nsgt spectral features bft mir pitch mir2 deep vqt
  classic dsp harmonic pitch_ffp pitch_stft
Fuzz groups (seeded parameter-space sweeps, one subprocess per case):
  fuzz_bft fuzz_cqt fuzz_nsgt fuzz_dwt fuzz_wavelet fuzz_pitch
  fuzz_onset fuzz_harmonic fuzz_chroma fuzz_core fuzz_extractor
  fuzz_resample fuzz_utils fuzz_reassign fuzz_edges fuzz_features
  fuzz_mir2 fuzz_spectral fuzz_stft fuzz_dsp fuzz_deep
"all" regenerates everything.
"""

import ctypes
import os
import sys
import importlib.util

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(ROOT, "tests", "goldens")
REF_PKG = os.path.join(ROOT, ".ref", "pkg")
REF_LIB = os.path.join(ROOT, ".ref", "libaudioflux.so")


def _setup_reference():
    spec = importlib.util.spec_from_file_location(
        "soundfile", os.path.join(ROOT, ".ref", "soundfile_stub.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sys.modules["soundfile"] = m
    sys.path.insert(0, REF_PKG)
    import warnings
    warnings.filterwarnings("ignore")
    import audioflux as af
    return af


def signals():
    sr = 32000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    sine = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    k = (8000.0 / 20.0) ** (1.0 / 1.0)
    chirp = (0.5 * np.cos(2 * np.pi * 20 * (np.power(k, t) - 1) / np.log(k))
             ).astype(np.float32)
    short = sine[:4096].copy()
    # 2-note "chord" for pitch/chroma style tests
    chord = (0.3 * np.sin(2 * np.pi * 261.63 * t)
             + 0.3 * np.sin(2 * np.pi * 392.0 * t)).astype(np.float32)
    return {"sine": sine, "chirp": chirp, "short": short, "chord": chord}


def save(name, **arrs):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrs)
    print(f"wrote {path}: {', '.join(f'{k}{v.shape}' for k, v in arrs.items())}")


def gen_windows():
    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    fn = lib["window_calFFTWindow"]
    fn.restype = ctypes.POINTER(ctypes.c_float)
    out = {}
    for wt in range(14):
        for length in (256, 1024, 255):
            p = fn(ctypes.c_int(wt), ctypes.c_int(length))
            out[f"w{wt}_{length}"] = np.ctypeslib.as_array(p, (length,)).copy()
    save("windows", **out)



# (scale, style, norm, num, low, high, bpo)
_FB_CASES = [
    (2, 0, 0, 128, 0.0, 16000.0, 12),    # mel slaney
    (2, 1, 0, 128, 0.0, 16000.0, 12),    # mel etsi
    (2, 0, 1, 128, 0.0, 16000.0, 12),    # mel slaney area
    (2, 0, 2, 128, 0.0, 16000.0, 12),    # mel slaney bandwidth
    (2, 5, 0, 64, 0.0, 16000.0, 12),     # mel hann
    (2, 10, 0, 64, 0.0, 16000.0, 12),    # mel gauss
    (2, 3, 0, 64, 0.0, 16000.0, 12),     # mel point
    (2, 4, 0, 64, 0.0, 16000.0, 12),     # mel rect
    (3, 0, 0, 128, 0.0, 16000.0, 12),    # bark slaney
    (4, 0, 0, 128, 0.0, 16000.0, 12),    # erb slaney
    (4, 2, 0, 128, 0.0, 16000.0, 12),    # erb gammatone
    (1, 0, 0, 64, 100.0, 8000.0, 12),    # linspace
    (5, 0, 0, 84, 32.703, 16000.0, 12),  # octave
    (6, 0, 0, 84, 32.703, 16000.0, 12),  # logspace
]


def gen_filterbanks():
    # one subprocess per case: reference heap overflows would otherwise
    # corrupt the allocator between cases
    import subprocess
    out = {}
    for i in range(len(_FB_CASES)):
        path = os.path.join(GOLDEN_DIR, f"_fbcase{i}.npz")
        if os.path.exists(path):
            os.remove(path)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        f"_fbcase{i}"])
        # a crash during interpreter teardown (reference heap quirks) is fine
        # as long as the fixture was written
        if not os.path.exists(path):
            raise RuntimeError(f"filterbank case {i} failed")
        part = np.load(path)
        out.update({k: part[k] for k in part.files})
        os.remove(os.path.join(GOLDEN_DIR, f"_fbcase{i}.npz"))
    save("filterbanks", **out)


def gen_filterbank_case(i):
    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    fn = lib["auditory_filterBank"]
    out = {}
    fft_length = 2048
    sr = 32000
    m_len = fft_length // 2 + 1
    cases = [_FB_CASES[i]]
    for (scale, style, norm, num, low, high, bpo) in cases:
        if scale == 0:
            det = sr / float(fft_length)
            low_i = int(np.round(np.float32(low) / np.float32(det)))
            high_i = int(np.round(np.float32(high) / np.float32(det)))
            num = high_i - low_i + 1
        # NOTE: buffers oversized by 8 floats — the reference writes one
        # harmless 0 past the last row for bands touching the Nyquist edge
        # (ETSI/window styles, auditory_filterBank.c:402-404).
        fb = np.zeros((num * m_len + 8,), dtype=np.float32)
        fre = np.zeros(num + 8, dtype=np.float32)
        bins = np.zeros(num + 8, dtype=np.int32)
        fn(ctypes.c_int(num), ctypes.c_int(fft_length), ctypes.c_int(sr),
           ctypes.c_int(0), ctypes.c_int(scale), ctypes.c_int(style),
           ctypes.c_int(norm), ctypes.c_float(low), ctypes.c_float(high),
           ctypes.c_int(bpo),
           fb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           fre.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           bins.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        key = f"s{scale}_st{style}_n{norm}_{num}"
        out[f"{key}_fb"] = fb[:num * m_len].reshape(num, m_len)
        out[f"{key}_fre"] = fre[:num]
        out[f"{key}_bin"] = bins[:num]
    save(f"_fbcase{i}", **out)


def gen_spectrogram(af):
    from audioflux.spectrogram import Spectrogram as _Spectrogram
    sigs = signals()
    out = {}
    x = sigs["sine"]

    mel = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512)
    spec = mel.spectrogram(x)
    out["mel_spec"] = spec
    out["mel_fre"] = mel.get_fre_band_arr()
    out["mel_mfcc"] = mel.mfcc(spec, cc_num=13)

    bark = af.BarkSpectrogram(num=64, samplate=32000, radix2_exp=11,
                              slide_length=512)
    bspec = bark.spectrogram(x)
    out["bark_spec"] = bspec
    out["bark_bfcc"] = bark.bfcc(bspec, cc_num=13)

    erb = af.ErbSpectrogram(num=64, samplate=32000, radix2_exp=11,
                            slide_length=512)
    out["erb_spec"] = erb.spectrogram(x)

    gt = _Spectrogram(num=64, samplate=32000, radix2_exp=11,
                        slide_length=512,
                        filter_bank_type=af.type.SpectralFilterBankType.ERB,
                        style_type=af.type.SpectralFilterBankStyleType.GAMMATONE)
    gspec = gt.spectrogram(x)
    out["gamma_spec"] = gspec
    out["gamma_gtcc"] = gt.gtcc(gspec, cc_num=13)

    lin = _Spectrogram(samplate=32000, radix2_exp=11, slide_length=512,
                         filter_bank_type=af.type.SpectralFilterBankType.LINEAR)
    out["linear_spec"] = lin.spectrogram(x)

    linsub = _Spectrogram(samplate=32000, radix2_exp=11, slide_length=512,
                            low_fre=100.0, high_fre=8000.0,
                            filter_bank_type=af.type.SpectralFilterBankType.LINEAR)
    out["linear_sub_spec"] = linsub.spectrogram(x)

    octv = _Spectrogram(num=84, samplate=32000, radix2_exp=11,
                          slide_length=512,
                          filter_bank_type=af.type.SpectralFilterBankType.OCTAVE)
    out["octave_spec"] = octv.spectrogram(sigs["chirp"])

    mag = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512,
                            data_type=af.type.SpectralDataType.MAG)
    out["mel_mag_spec"] = mag.spectrogram(x)
    save("spectrogram", **out)


def gen_chroma(af):
    from audioflux.spectrogram import Spectrogram as _Spectrogram
    sigs = signals()
    out = {}
    ch = _Spectrogram(num=12, samplate=32000, radix2_exp=11, slide_length=512,
                        filter_bank_type=af.type.SpectralFilterBankType.CHROMA)
    out["chroma_spec"] = ch.spectrogram(sigs["chord"])
    save("chroma", **out)


def gen_stft(af):
    sigs = signals()
    out = {}
    x = sigs["sine"]
    st = af.STFT(radix2_exp=11, window_type=af.type.WindowType.HANN,
                 slide_length=512)
    D = st.stft(x)
    out["stft_re"] = D.real.astype(np.float32)
    out["stft_im"] = D.imag.astype(np.float32)
    out["istft_w"] = st.istft(D, method_type=0)
    out["istft_ola"] = st.istft(D, method_type=1)

    # padded variants
    for pos, mode, tag in ((0, 0, "center_const"), (0, 1, "center_reflect"),
                           (0, 2, "center_wrap"), (1, 1, "right_reflect"),
                           (2, 1, "left_reflect")):
        stp = af.STFT(radix2_exp=11, window_type=af.type.WindowType.HANN,
                      slide_length=512)
        stp.enable_padding(True)
        stp.set_padding(af.type.PaddingPositionType(pos),
                        af.type.PaddingModeType(mode), 0.0, 0.0)
        Dp = stp.stft(x)
        out[f"stft_{tag}_re"] = Dp.real.astype(np.float32)
        out[f"stft_{tag}_im"] = Dp.imag.astype(np.float32)
    save("stft", **out)


def gen_spectral(af):
    sigs = signals()
    out = {}
    x = sigs["chord"]

    mel = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512)
    spec = mel.spectrogram(x)  # (128, T) power
    fre = mel.get_fre_band_arr()
    T = spec.shape[-1]
    out["in_spec"] = spec
    out["in_fre"] = fre

    sp = af.Spectral(num=128, fre_band_arr=fre)
    sp.set_time_length(T)
    out["flatness"] = sp.flatness(spec)
    out["flux"] = sp.flux(spec)
    out["flux_pos_exp_mean"] = sp.flux(spec, step=2, p=2, is_positive=True,
                                       is_exp=True, tp=1)
    out["rolloff"] = sp.rolloff(spec, threshold=0.95)
    out["centroid"] = sp.centroid(spec)
    out["spread"] = sp.spread(spec)
    out["skewness"] = sp.skewness(spec)
    out["kurtosis"] = sp.kurtosis(spec)
    out["entropy"] = sp.entropy(spec)
    out["entropy_norm"] = sp.entropy(spec, is_norm=True)
    out["crest"] = sp.crest(spec)
    out["slope"] = sp.slope(spec)
    out["decrease"] = sp.decrease(spec)
    out["band_width"] = sp.band_width(spec)
    out["band_width_p1"] = sp.band_width(spec, p=1)
    out["rms"] = sp.rms(spec)
    out["energy"] = sp.energy(spec)
    out["energy_log"] = sp.energy(spec, is_log=True, gamma=10.0)
    out["hfc"] = sp.hfc(spec)
    out["sd"] = sp.sd(spec)
    out["sf"] = sp.sf(spec)
    out["mkl"] = sp.mkl(spec)
    out["broadband"] = sp.broadband(spec, threshold=0)
    out["novelty"] = sp.novelty(spec)
    out["novelty_kl_num"] = sp.novelty(spec, step=1, threshold=0.0,
                                       method_type=af.type.SpectralNoveltyMethodType.KL,
                                       data_type=af.type.SpectralNoveltyDataType.NUMBER)
    out["eef"] = sp.eef(spec)
    out["eer"] = sp.eer(spec, gamma=1.0)
    mx_v, mx_f = sp.max(spec)
    out["max_v"], out["max_f"] = mx_v, mx_f
    mn_v, mn_f = sp.mean(spec)
    out["mean_v"], out["mean_f"] = mn_v, mn_f
    vr_v, vr_f = sp.var(spec)
    out["var_v"], out["var_f"] = vr_v, vr_f

    # band-subset variant
    sp.set_edge(10, 99)
    out["edge_centroid"] = sp.centroid(spec)
    out["edge_hfc"] = sp.hfc(spec)
    out["edge_decrease"] = sp.decrease(spec)
    out["edge_rms"] = sp.rms(spec)

    # phase-based features on a linear STFT
    st = af.STFT(radix2_exp=11, window_type=af.type.WindowType.HANN,
                 slide_length=512)
    D = st.stft(x)
    mspec = np.abs(D).astype(np.float32)
    mphase = af.utils.get_phase(D).astype(np.float32)
    out["in_mspec"] = mspec
    out["in_mphase"] = mphase
    sp2 = af.Spectral(num=mspec.shape[0],
                      fre_band_arr=np.linspace(0, 16000, mspec.shape[0]
                                               ).astype(np.float32))
    sp2.set_time_length(mspec.shape[-1])
    out["pd"] = sp2.pd(mspec, mphase)
    out["wpd"] = sp2.wpd(mspec, mphase)
    out["nwpd"] = sp2.nwpd(mspec, mphase)
    out["cd"] = sp2.cd(mspec, mphase)
    out["rcd"] = sp2.rcd(mspec, mphase)
    save("spectral", **out)


def gen_features(af):
    sigs = signals()
    out = {}
    x = sigs["chord"]

    mel = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512)
    spec = mel.spectrogram(x)
    T = spec.shape[-1]
    out["in_spec"] = spec

    # xxcc + standard deltas
    xx = af.XXCC(num=128)
    xx.set_time_length(T)
    out["xxcc"] = xx.xxcc(spec, cc_num=13)
    out["xxcc_cbrt"] = xx.xxcc(spec, cc_num=13,
                               rectify_type=af.type.CepstralRectifyType.CUBIC_ROOT)
    rng = np.random.default_rng(1)
    energy = (rng.uniform(0.1, 5.0, T)).astype(np.float32)
    out["in_energy"] = energy
    coe, d1, d2 = xx.xxcc_standard(spec, energy, cc_num=13,
                                   delta_window_length=9,
                                   energy_type=af.type.CepstralEnergyType.REPLACE)
    out["std_coe"], out["std_d1"], out["std_d2"] = coe, d1, d2
    # NOTE: APPEND energy mode crashes the reference (its Python wrapper
    # allocates timeLength*ccNum but C writes timeLength*(ccNum+1)); covered
    # by shape/consistency tests on our side only.

    # deconv
    dc = af.Deconv(num=128)
    dc.set_time_length(T)
    timbre, pitch = dc.deconv(spec)
    out["deconv_timbre"], out["deconv_pitch"] = timbre, pitch

    # temporal
    tp = af.Temporal(frame_length=2048, slide_length=512)
    res = tp.temporal(x, has_energy=True, has_rms=True, has_zcr=True)
    out["temp_energy"] = res["energy_arr"]
    out["temp_rms"] = res["rms_arr"]
    out["temp_zcr"] = res["zcr_arr"]
    # ezr is C-only (temporalObj_ezr); golden from its exact formula
    e32 = res["energy_arr"].astype(np.float32)
    z32 = res["zcr_arr"].astype(np.float32)
    out["temp_ezr"] = (np.log10(1 + e32 * np.float32(1.0))
                       / (z32 * np.float32(2048) + 1)).astype(np.float32)

    # cepstrogram
    cp = af.Cepstrogram(radix2_exp=11, samplate=32000, slide_length=512)
    c1, c2, c3 = cp.cepstrogram(x, cep_num=32)
    out["ceps"], out["ceps_env"], out["ceps_det"] = c1, c2, c3
    save("features", **out)


def gen_bft(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:16000]

    # reassign (ALL) on its own
    rs = af.Reassign(radix2_exp=11, samplate=32000,
                     window_type=af.type.WindowType.HANN, slide_length=512,
                     re_type=af.type.ReassignType.ALL, thresh=0.001,
                     is_padding=False)
    D, _ = rs.reassign(x)
    out["reassign_re"] = D.real.astype(np.float32)
    out["reassign_im"] = D.imag.astype(np.float32)

    rs2 = af.Reassign(radix2_exp=11, samplate=32000,
                      window_type=af.type.WindowType.HANN, slide_length=512,
                      re_type=af.type.ReassignType.FRE, thresh=0.001,
                      is_padding=False)
    D2, _ = rs2.reassign(x)
    out["reassign_fre_re"] = D2.real.astype(np.float32)
    out["reassign_fre_im"] = D2.imag.astype(np.float32)

    # BFT mel mag real result
    bft = af.BFT(num=128, radix2_exp=11, samplate=32000, slide_length=512,
                 scale_type=af.type.SpectralFilterBankScaleType.MEL,
                 data_type=af.type.SpectralDataType.MAG,
                 is_reassign=False)
    out["bft_mel_mag"] = np.abs(bft.bft(x, result_type=1))

    # BFT linear complex (power dataType -> squared complex)
    bft2 = af.BFT(num=1025, radix2_exp=11, samplate=32000, slide_length=512,
                  scale_type=af.type.SpectralFilterBankScaleType.LINEAR,
                  data_type=af.type.SpectralDataType.POWER,
                  is_reassign=False)
    C = bft2.bft(x, result_type=0)
    out["bft_lin_cpx_re"] = C.real.astype(np.float32)
    out["bft_lin_cpx_im"] = C.imag.astype(np.float32)

    # BFT mel power with reassign
    bft3 = af.BFT(num=128, radix2_exp=11, samplate=32000, slide_length=512,
                  scale_type=af.type.SpectralFilterBankScaleType.MEL,
                  data_type=af.type.SpectralDataType.POWER,
                  is_reassign=True)
    out["bft_mel_rea"] = np.abs(bft3.bft(x, result_type=1))
    save("bft", **out)


def gen_cqt(af):
    sigs = signals()
    out = {}
    x = sigs["chord"]

    cqt = af.CQT(num=84, samplate=32000)
    C = cqt.cqt(x)
    out["cqt_re"] = C.real.astype(np.float32)
    out["cqt_im"] = C.imag.astype(np.float32)
    out["cqt_fre"] = cqt.get_fre_band_arr()
    out["cqt_fft_length"] = np.array([cqt.get_fft_length()], np.int64)
    mag = np.abs(C).astype(np.float32)
    out["cqt_chroma"] = cqt.chroma(C)
    out["cqt_cqcc"] = cqt.cqcc(mag, cc_num=13)
    out["cqt_cqhc"] = cqt.cqhc(np.abs(C)**2, hc_num=13)
    t, p = cqt.deconv(mag)
    out["cqt_dec_t"], out["cqt_dec_p"] = t, p
    save("cqt", **out)


def gen_vqt(af):
    sigs = signals()
    out = {}
    x = sigs["chord"]
    vqt = af.CQT(num=84, samplate=32000, beta=0.5)
    C = vqt.cqt(x)
    out["vqt_re"] = C.real.astype(np.float32)
    out["vqt_im"] = C.imag.astype(np.float32)
    save("vqt", **out)


def gen_cwt(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:4096]
    W = af.type.WaveletContinueType
    S = af.type.SpectralFilterBankScaleType
    cases = {
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
    for name, kw in cases.items():
        kw.setdefault("num", 84)
        obj = af.CWT(radix2_exp=12, samplate=32000, **kw)
        C = obj.cwt(x)
        out[f"{name}_re"] = C.real.astype(np.float32)
        out[f"{name}_im"] = C.imag.astype(np.float32)
        out[f"{name}_fre"] = obj.get_fre_band_arr()
    save("cwt", **out)


def gen_pwt(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:4096]
    S = af.type.SpectralFilterBankScaleType
    obj = af.PWT(num=84, radix2_exp=12, samplate=32000, scale_type=S.OCTAVE)
    C = obj.pwt(x)
    out["oct_re"] = C.real.astype(np.float32)
    out["oct_im"] = C.imag.astype(np.float32)
    out["oct_fre"] = obj.get_fre_band_arr()
    obj2 = af.PWT(num=64, radix2_exp=12, samplate=32000, scale_type=S.MEL)
    C2 = obj2.pwt(x)
    out["mel_re"] = C2.real.astype(np.float32)
    out["mel_im"] = C2.imag.astype(np.float32)
    save("pwt", **out)


def gen_synsq(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:4096]
    S = af.type.SpectralFilterBankScaleType
    W = af.type.WaveletContinueType

    cwt = af.CWT(num=84, radix2_exp=12, samplate=32000,
                 wavelet_type=W.MORSE, scale_type=S.OCTAVE)
    C = cwt.cwt(x)
    fre = cwt.get_fre_band_arr()
    out["in_re"], out["in_im"] = C.real.astype(np.float32), C.imag.astype(np.float32)
    out["in_fre"] = fre
    sq = af.Synsq(num=84, radix2_exp=12, samplate=32000)
    R = sq.synsq(C, S.OCTAVE, fre)
    out["synsq_re"] = R.real.astype(np.float32)
    out["synsq_im"] = R.imag.astype(np.float32)

    ws = af.WSST(num=84, radix2_exp=12, samplate=32000,
                 wavelet_type=W.MORSE, scale_type=S.OCTAVE)
    A, B = ws.wsst(x)
    out["wsst_sq_re"], out["wsst_sq_im"] = A.real.astype(np.float32), A.imag.astype(np.float32)
    out["wsst_cwt_re"], out["wsst_cwt_im"] = B.real.astype(np.float32), B.imag.astype(np.float32)
    save("synsq", **out)


def gen_st(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:1024]

    st = af.ST(radix2_exp=10, min_index=1, max_index=511)
    C = st.st(x)
    out["st_re"] = C.real.astype(np.float32)
    out["st_im"] = C.imag.astype(np.float32)

    st2 = af.ST(radix2_exp=10, min_index=10, max_index=100, factor=2.0,
                norm=0.8)
    C2 = st2.st(x)
    out["st2_re"] = C2.real.astype(np.float32)
    out["st2_im"] = C2.imag.astype(np.float32)

    fst = af.FST(radix2_exp=10, min_index=1, max_index=511, samplate=32000)
    C3 = fst.fst(x)
    out["fst_re"] = C3.real.astype(np.float32)
    out["fst_im"] = C3.imag.astype(np.float32)
    fstb = af.FST(radix2_exp=10, min_index=5, max_index=100, samplate=32000)
    C4 = fstb.fst(x)
    out["fst2_re"] = C4.real.astype(np.float32)
    out["fst2_im"] = C4.imag.astype(np.float32)
    save("st", **out)


def gen_dwt(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:1024]
    W = af.type.WaveletDiscreteType
    # NOTE: the reference Python DWT wrapper passes samplate where the C
    # ctor expects waveletType*, so it always uses sym4 regardless of
    # wavelet_type. Drive dwtObj_* directly for per-wavelet goldens.
    obj = af.DWT(num=5, radix2_exp=10, samplate=32000,
                 wavelet_type=W.SYM, t1=4, t2=0)
    coef, m = obj.dwt(x)
    out["dwt_sym4_coef"] = coef
    out["dwt_sym4_m"] = m

    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    for name, wt, t1, t2 in [("db4", 1, 4, 0), ("coif3", 3, 3, 0),
                             ("haar", 0, 0, 0), ("bior3_5", 5, 3, 5),
                             ("fk8", 4, 8, 0), ("dmey", 6, 0, 0)]:
        o = ctypes.c_void_p()
        fn = lib["dwtObj_new"]
        fn(ctypes.byref(o), ctypes.c_int(5), ctypes.c_int(10),
           ctypes.byref(ctypes.c_int(wt)), ctypes.byref(ctypes.c_int(t1)),
           ctypes.byref(ctypes.c_int(t2)))
        coef = np.zeros(1024, np.float32)
        m = np.zeros((5, 1024), np.float32)
        lib["dwtObj_dwt"](o, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          coef.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        out[f"dwt_{name}_coef"] = coef
        out[f"dwt_{name}_m"] = m

    wobj = af.WPT(num=4, radix2_exp=10, samplate=32000,
                  wavelet_type=W.SYM, t1=4)
    coef, m = wobj.wpt(x)
    out["wpt_coef"], out["wpt_m"] = coef, m

    sobj = af.SWT(num=4, fft_length=1024, wavelet_type=W.DB, t1=4)
    a, d = sobj.swt(x)
    out["swt_a"], out["swt_d"] = a, d
    save("dwt", **out)


def gen_nsgt(af):
    sigs = signals()
    out = {}
    x = sigs["chord"][:4096]
    S = af.type.SpectralFilterBankScaleType

    obj = af.NSGT(num=84, radix2_exp=12, samplate=32000, scale_type=S.OCTAVE)
    C = obj.nsgt(x)
    out["oct_re"] = C.real.astype(np.float32)
    out["oct_im"] = C.imag.astype(np.float32)
    out["oct_fre"] = obj.get_fre_band_arr()
    out["oct_lens"] = np.asarray(obj.get_time_length_arr(), np.int64)

    obj2 = af.NSGT(num=64, radix2_exp=12, samplate=32000, scale_type=S.MEL,
                   nsgt_filter_bank_type=af.type.NSGTFilterBankType.STANDARD)
    C2 = obj2.nsgt(x)
    out["mel_std_re"] = C2.real.astype(np.float32)
    out["mel_std_im"] = C2.imag.astype(np.float32)
    out["mel_std_lens"] = np.asarray(obj2.get_time_length_arr(), np.int64)
    save("nsgt", **out)


def gen_mir(af):
    sigs = signals()
    out = {}
    sr = 32000
    t = np.arange(sr) / sr
    # gliding tone + percussive clicks for onset/hpss/pitch
    tone = 0.6 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out_sig = tone.copy()
    for p in (4000, 12000, 20000, 28000):
        out_sig[p:p+200] += (0.8 * np.random.default_rng(3).standard_normal(200)).astype(np.float32)
    x = out_sig.astype(np.float32)
    out["in_x"] = x

    # YIN
    yin = af.PitchYIN(samplate=sr, radix2_exp=12, slide_length=1024)
    fre, v1, v2 = yin.pitch(tone)
    out["yin_fre"], out["yin_val"] = fre, v1

    # HPSS
    hp = af.HPSS(radix2_exp=11, window_type=af.type.WindowType.HAMM,
                 slide_length=512, h_order=21, p_order=31)
    h, p = hp.hpss(x)
    out["hpss_h"], out["hpss_p"] = h, p

    # Onset on a mel BFT spectrogram
    bft = af.BFT(num=128, radix2_exp=11, samplate=sr, slide_length=512,
                 scale_type=af.type.SpectralFilterBankScaleType.MEL,
                 data_type=af.type.SpectralDataType.POWER)
    spec = np.abs(bft.bft(x, result_type=1))
    out["onset_spec"] = spec
    on = af.Onset(time_length=spec.shape[-1], fre_length=128,
                  slide_length=512, samplate=sr,
                  novelty_type=af.type.NoveltyType.FLUX)
    point_arr, evn_arr, time_arr, value_arr = on.onset(spec)
    out["onset_points"] = np.asarray(point_arr, np.int64)
    out["onset_env"] = evn_arr
    save("mir", **out)


def gen_pitch(af):
    out = {}
    sr = 32000
    t = np.arange(sr) / sr
    # 220 Hz tone with harmonics (so HPS/LHS/PEF lock properly)
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
            + 0.12 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    out["in_tone"] = tone
    W = af.type.WindowType
    ncf = af.PitchNCF(samplate=sr, radix2_exp=12, slide_length=1024)
    out["ncf"] = ncf.pitch(tone)
    cep = af.PitchCEP(samplate=sr, radix2_exp=12, slide_length=1024)
    out["cep"] = cep.pitch(tone)
    hps = af.PitchHPS(samplate=sr, radix2_exp=12, slide_length=1024)
    out["hps"] = hps.pitch(tone)
    lhs = af.PitchLHS(samplate=sr, radix2_exp=12, slide_length=1024)
    out["lhs"] = lhs.pitch(tone)
    pef = af.PitchPEF(samplate=sr, radix2_exp=12, slide_length=1024)
    out["pef"] = pef.pitch(tone)
    save("pitch", **out)


def gen_mir2(af):
    out = {}
    sr = 32000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out["in_tone"] = tone

    hr = af.HarmonicRatio(samplate=sr, radix2_exp=12, slide_length=512)
    out["hr"] = hr.harmonic_ratio(tone)

    ts = af.TimeStretch(radix2_exp=11, slide_length=512)
    out["ts_fast"] = ts.time_stretch(tone, 1.5)
    out["ts_slow"] = ts.time_stretch(tone, 0.8)

    ps = af.PitchShift(radix2_exp=11, slide_length=512)
    out["ps_up5"] = ps.pitch_shift(tone, 5, sr)
    save("mir2", **out)


def gen_deep(af):
    sigs = signals()
    out = {}
    x = sigs["chord"]
    out["in_x"] = x
    from audioflux.spectrogram import Deep as _Deep, DeepChroma as _DeepChroma
    dp = _Deep(num=84, samplate=32000, radix2_exp=12)
    D = dp.spectrogram(x)
    out["deep"] = D
    # neighbor-channel layouts 2..4 (spectrogramObj_setDeepOrder)
    for k in (2, 3, 4):
        dpk = _Deep(num=84, samplate=32000, radix2_exp=12)
        dpk.set_deep_order(k)
        out[f"deep_o{k}"] = dpk.spectrogram(x)
    dc = _DeepChroma(samplate=32000, radix2_exp=12)
    out["deep_chroma"] = dc.spectrogram(x)
    save("deep", **out)


# ---------------------------------------------------------------------------
# Randomized BFT parameter-space fuzz (fixed seed, one subprocess per case).
# The fixed-case goldens pin known configurations; this walks the
# scale x style x norm x window x fft x slide x data-type space so
# regressions off the beaten path get caught too.  CHROMA/DEEP scales are
# excluded: this package routes them through the Spectrogram hub, not BFT.


def _gen_fuzz_group(prefix, n, save_name):
    """Run n per-case subprocesses (the reference corrupts its allocator
    across calls) and merge the per-case fixtures into one .npz."""
    import subprocess
    out = {}
    for i in range(n):
        path = os.path.join(GOLDEN_DIR, f"{prefix}{i}.npz")
        if os.path.exists(path):
            os.remove(path)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        f"{prefix}{i}"])
        if not os.path.exists(path):
            raise RuntimeError(f"{save_name} case {i} failed")
        part = np.load(path)
        out.update({f"c{i}_{k}": part[k] for k in part.files})
        os.remove(path)
    save(save_name, **out)


def fuzz_bft_params(n=36, seed=20260818):
    rng = np.random.default_rng(seed)
    sr = 32000
    space = [  # (scale, style pool, norm pool)
        (0, [0], [0]),                             # LINEAR
        (1, [0], [0]),                             # LINSPACE
        (2, [0, 1, 3, 4, 5, 6, 10], [0, 1, 2]),    # MEL
        (3, [0, 1, 3, 4, 5, 6, 10], [0, 1, 2]),    # BARK
        (4, [0, 2], [0, 1, 2]),                    # ERB
        (5, [0], [0]),                             # OCTAVE
        (6, [0], [0]),                             # LOG
    ]
    cases = []
    for _ in range(n):
        scale, styles, norms = space[int(rng.integers(len(space)))]
        # OCTAVE/LOG at fft<=1024 segfault the reference C (its log-scale
        # filterbank writes out of bounds); stay where it survives
        r2e = int(rng.choice([11, 12] if scale >= 5 else [9, 10, 11, 12]))
        fft = 1 << r2e
        p = dict(scale=scale, style=int(rng.choice(styles)),
                 norm=int(rng.choice(norms)), r2e=r2e,
                 slide=int(rng.choice([fft // 4, fft // 2, 500])),
                 window=int(rng.integers(14)),
                 data=int(rng.integers(2)), bpo=12)
        if scale == 0:
            low, high = [(0.0, sr / 2.0), (100.0, 8000.0),
                         (500.0, 12000.0)][int(rng.integers(3))]
            det = np.float32(sr) / np.float32(fft)
            num = (int(np.round(np.float32(high) / det))
                   - int(np.round(np.float32(low) / det)) + 1)
            p.update(num=num, low=low, high=high)
        elif scale == 1:
            # high stays off sr/2: bands touching the Nyquist edge make
            # the reference write one float past its filterbank buffer
            # (auditory_filterBank.c:402-404) and corrupt the heap
            p.update(num=int(rng.choice([32, 64, 96])),
                     low=float(rng.choice([0.0, 100.0, 500.0])),
                     high=float(rng.choice([8000.0, 12000.0, 15000.0])))
        elif scale in (2, 3, 4):
            p.update(num=int(rng.choice([26, 64, 128])),
                     low=float(rng.choice([0.0, 50.0])),
                     high=float(rng.choice([8000.0, 15000.0])))
        elif scale == 5:
            p.update(num=int(rng.choice([60, 84])), low=32.703, high=16000.0)
        else:
            p.update(num=84, low=32.703, high=16000.0)
        cases.append(p)
    return cases


def gen_fuzz_bft_case(i):
    import json
    af = _setup_reference()
    p = fuzz_bft_params()[i]
    # the noisy sine: broadband energy so every sub-band comparison has
    # real signal (the chord's partials sit below some fuzzed band edges)
    x = signals()["sine"][:8000]
    T = af.type
    bft = af.BFT(num=p["num"], radix2_exp=p["r2e"], samplate=32000,
                 low_fre=p["low"], high_fre=p["high"],
                 bin_per_octave=p["bpo"],
                 window_type=T.WindowType(p["window"]),
                 slide_length=p["slide"],
                 scale_type=T.SpectralFilterBankScaleType(p["scale"]),
                 style_type=T.SpectralFilterBankStyleType(p["style"]),
                 normal_type=T.SpectralFilterBankNormalType(p["norm"]),
                 data_type=T.SpectralDataType(p["data"]))
    arr = np.abs(bft.bft(x, result_type=1)).astype(np.float32)
    save(f"_fuzzbft{i}", arr=arr,
         fre=np.asarray(bft.get_fre_band_arr(), np.float32),
         params=np.array(json.dumps(p)))


def gen_fuzz_bft():
    _gen_fuzz_group("_fuzzbft", len(fuzz_bft_params()), "fuzz_bft")


def fuzz_cqt_params(n=16, seed=60818):
    """Seeded random walk over the CQT/VQT parameter space.

    Constraints mirror the reference wrapper: bpo in {12,24,36}, num a
    multiple of bpo, top frequency low*2^(num/bpo) under samplate/2.
    """
    rng = np.random.default_rng(seed)
    cases = []
    while len(cases) < n:
        bpo = int(rng.choice([12, 24, 36]))
        octaves = int(rng.integers(4, 8))
        low = float(rng.choice([32.703, 55.0, 65.41]))
        if low * (2.0 ** octaves) >= 16000.0:
            continue
        cases.append(dict(
            num=bpo * octaves, bpo=bpo, low=low,
            window=int(rng.integers(14)),
            normal=int(rng.integers(3)),
            is_scale=bool(rng.integers(2)),
            beta=float(rng.choice([0.0, 0.0, 0.5])),
            thresh=float(rng.choice([0.01, 0.0005])),
            factor=1.0))
    return cases


def gen_fuzz_cqt_case(i):
    import json
    af = _setup_reference()
    p = fuzz_cqt_params()[i]
    x = signals()["sine"]
    T = af.type
    obj = af.CQT(num=p["num"], samplate=32000, low_fre=p["low"],
                 bin_per_octave=p["bpo"], factor=p["factor"],
                 beta=p["beta"], thresh=p["thresh"],
                 window_type=T.WindowType(p["window"]),
                 normal_type=T.SpectralFilterBankNormalType(p["normal"]),
                 is_scale=p["is_scale"])
    C = obj.cqt(x)
    save(f"_fuzzcqt{i}", mag=np.abs(C).astype(np.float32),
         fre=np.asarray(obj.get_fre_band_arr(), np.float32),
         params=np.array(json.dumps(p)))


def gen_fuzz_cqt():
    _gen_fuzz_group("_fuzzcqt", len(fuzz_cqt_params()), "fuzz_cqt")


def fuzz_nsgt_params(n=12, seed=70818):
    """Seeded random walk over NSGT's space (styles minus GAMMATONE,
    norms NONE/BAND_WIDTH per the reference wrapper's own checks)."""
    rng = np.random.default_rng(seed)
    cases = []
    for _ in range(n):
        scale = int(rng.choice([0, 1, 2, 3, 4, 5, 6]))
        r2e = int(rng.choice([11, 12]))
        p = dict(scale=scale, r2e=r2e,
                 bank=int(rng.integers(2)),
                 style=int(rng.choice([0, 5, 10])),
                 norm=int(rng.choice([0, 2])),
                 min_len=int(rng.choice([3, 8])), bpo=12)
        if scale in (0, 1):
            p.update(num=64, low=100.0, high=8000.0)
        elif scale in (2, 3, 4):
            p.update(num=int(rng.choice([32, 64])),
                     low=float(rng.choice([0.0, 50.0])),
                     high=float(rng.choice([8000.0, 15000.0])))
        else:
            p.update(num=84, low=32.703, high=16000.0)
        cases.append(p)
    return cases


def gen_fuzz_nsgt_case(i):
    import json
    af = _setup_reference()
    p = fuzz_nsgt_params()[i]
    x = signals()["sine"][:1 << p["r2e"]]
    T = af.type
    obj = af.NSGT(num=p["num"], radix2_exp=p["r2e"], samplate=32000,
                  low_fre=p["low"], high_fre=p["high"],
                  bin_per_octave=p["bpo"], min_len=p["min_len"],
                  nsgt_filter_bank_type=T.NSGTFilterBankType(p["bank"]),
                  scale_type=T.SpectralFilterBankScaleType(p["scale"]),
                  style_type=T.SpectralFilterBankStyleType(p["style"]),
                  normal_type=T.SpectralFilterBankNormalType(p["norm"]))
    C = obj.nsgt(x)
    save(f"_fuzznsgt{i}", mag=np.abs(C).astype(np.float32),
         fre=np.asarray(obj.get_fre_band_arr(), np.float32),
         lens=np.asarray(obj.get_time_length_arr(), np.int64),
         params=np.array(json.dumps(p)))


def gen_fuzz_nsgt():
    _gen_fuzz_group("_fuzznsgt", len(fuzz_nsgt_params()), "fuzz_nsgt")


# Full per-wavelet DWT sweep: every wavelet in the coef table, driven
# through dwtObj_* ctypes (the reference Python DWT wrapper marshals
# samplate where the C expects waveletType*, so it cannot select
# wavelets itself).  Same list as tools/gen_wavelet_coefs.py.
_DWT_SWEEP = [(0, 0, 0, "haar")]
_DWT_SWEEP += [(1, t, 0, f"db{t}") for t in list(range(2, 11)) + [20, 30, 40]]
_DWT_SWEEP += [(2, t, 0, f"sym{t}") for t in list(range(2, 11)) + [20, 30]]
_DWT_SWEEP += [(3, t, 0, f"coif{t}") for t in range(1, 6)]
_DWT_SWEEP += [(4, t, 0, f"fk{t}") for t in (4, 6, 8, 14, 18, 22)]
_DWT_SWEEP += [(5, a, b, f"bior{a}.{b}") for (a, b) in
               [(1, 1), (1, 3), (1, 5), (2, 2), (2, 4), (2, 6), (2, 8),
                (3, 1), (3, 3), (3, 5), (3, 7), (3, 9), (4, 4), (5, 5),
                (6, 8)]]
_DWT_SWEEP += [(6, 0, 0, "dmey")]


def gen_fuzz_dwt_case(i):
    wt, t1, t2, name = _DWT_SWEEP[i]
    x = signals()["sine"][:1024]
    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    o = ctypes.c_void_p()
    lib["dwtObj_new"](ctypes.byref(o), ctypes.c_int(5), ctypes.c_int(10),
                      ctypes.byref(ctypes.c_int(wt)),
                      ctypes.byref(ctypes.c_int(t1)),
                      ctypes.byref(ctypes.c_int(t2)))
    coef = np.zeros(1024, np.float32)
    m = np.zeros((5, 1024), np.float32)
    lib["dwtObj_dwt"](o, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      coef.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    save(f"_fuzzdwt{i}", coef=coef, m=m,
         params=np.array(f"{wt},{t1},{t2},{name}"))


def gen_fuzz_dwt():
    _gen_fuzz_group("_fuzzdwt", len(_DWT_SWEEP), "fuzz_dwt")


# WPT/SWT parameter sweep: the fixed dwt-group goldens only cover the
# default sym4 at one depth/length.  Unlike the DWT wrapper, the
# reference WPT/SWT Python ctors marshal waveletType/t1/t2 correctly,
# so these drive the reference wrappers directly.  Tuples:
# (kind, num, r2e_or_len, wt, t1, t2, name).
_WPT_SWT_SWEEP = [
    ("wpt", 3, 10, 0, 0, 0, "haar"),
    ("wpt", 5, 10, 1, 4, 0, "db4"),
    ("wpt", 1, 10, 2, 6, 0, "sym6"),
    ("wpt", 9, 10, 2, 4, 0, "sym4-full-depth"),
    ("wpt", 4, 12, 3, 2, 0, "coif2"),
    ("wpt", 3, 10, 5, 3, 5, "bior3.5"),
    ("wpt", 2, 8, 6, 0, 0, "dmey"),
    ("swt", 3, 1024, 2, 4, 0, "sym4"),
    ("swt", 5, 1024, 1, 2, 0, "db2"),
    ("swt", 1, 4096, 0, 0, 0, "haar"),
    ("swt", 4, 2048, 3, 1, 0, "coif1"),
    ("swt", 3, 1024, 4, 8, 0, "fk8"),
]


def gen_fuzz_wptswt_case(i):
    af = _setup_reference()
    kind, num, sz, wt, t1, t2, name = _WPT_SWT_SWEEP[i]
    T = af.type
    params = np.array(f"{kind},{num},{sz},{wt},{t1},{t2},{name}")
    if kind == "wpt":
        x = signals()["sine"][:1 << sz]
        obj = af.WPT(num=num, radix2_exp=sz,
                     wavelet_type=T.WaveletDiscreteType(wt), t1=t1, t2=t2)
        coef, m = obj.wpt(x)
        save(f"_fuzzwpt{i}", coef=coef, m=m, params=params)
    else:
        x = signals()["sine"][:sz]
        obj = af.SWT(num=num, fft_length=sz,
                     wavelet_type=T.WaveletDiscreteType(wt), t1=t1, t2=t2)
        a, d = obj.swt(x)
        save(f"_fuzzwpt{i}", a=a, d=d, params=params)


def gen_fuzz_wptswt():
    _gen_fuzz_group("_fuzzwpt", len(_WPT_SWT_SWEEP), "fuzz_wpt")


# CWT gamma/beta variations + PWT scale/style/norm sweep (the fixed-case
# cwt/pwt goldens only exercise default wavelet parameters and 2 scales).
_CWT_PARAM_CASES = [
    dict(wavelet="MORSE", gamma=3.0, beta=10.0, scale="OCTAVE", num=84,
         r2e=12),
    dict(wavelet="MORSE", gamma=2.0, beta=45.0, scale="OCTAVE", num=84,
         r2e=12),
    dict(wavelet="MORLET", gamma=8.0, beta=2.0, scale="OCTAVE", num=84,
         r2e=12),
    dict(wavelet="DOG", gamma=4.0, beta=None, scale="OCTAVE", num=84,
         r2e=12),
    dict(wavelet="MORSE", gamma=None, beta=None, scale="LINEAR", num=64,
         r2e=11, low=100.0, high=8000.0),
    dict(wavelet="MORLET", gamma=None, beta=None, scale="MEL", num=64,
         r2e=11),
]
_PWT_CASES = [
    dict(scale="LINEAR", style="SLANEY", norm="NONE", num=64, low=100.0,
         high=8000.0),
    # LINSPACE + window styles (HANN/GAUSS/...) segfault the reference
    # PWT bank generator on this box; SLANEY is its only surviving style
    dict(scale="LINSPACE", style="SLANEY", norm="NONE", num=64, low=100.0,
         high=8000.0),
    dict(scale="BARK", style="SLANEY", norm="NONE", num=64),
    dict(scale="ERB", style="GAUSS", norm="NONE", num=64),
    dict(scale="OCTAVE", style="HANN", norm="BAND_WIDTH", num=84),
    dict(scale="LOG", style="SLANEY", norm="NONE", num=84),
    dict(scale="OCTAVE", style="SLANEY", norm="AREA", num=84),
    dict(scale="MEL", style="HAMM", norm="NONE", num=64),
]


def gen_fuzz_wavelet_case(i):
    import json
    af = _setup_reference()
    x = signals()["sine"][:4096]
    T = af.type
    S = T.SpectralFilterBankScaleType
    if i < len(_CWT_PARAM_CASES):
        p = dict(_CWT_PARAM_CASES[i])
        x = signals()["sine"][:1 << p["r2e"]]
        obj = af.CWT(num=p["num"], radix2_exp=p["r2e"], samplate=32000,
                     low_fre=p.get("low"), high_fre=p.get("high"),
                     wavelet_type=getattr(T.WaveletContinueType,
                                          p["wavelet"]),
                     scale_type=getattr(S, p["scale"]),
                     gamma=p["gamma"], beta=p["beta"])
        C = obj.cwt(x)
    else:
        p = dict(_PWT_CASES[i - len(_CWT_PARAM_CASES)])
        p["r2e"] = 12
        obj = af.PWT(num=p["num"], radix2_exp=12, samplate=32000,
                     low_fre=p.get("low"), high_fre=p.get("high"),
                     scale_type=getattr(S, p["scale"]),
                     style_type=getattr(T.SpectralFilterBankStyleType,
                                        p["style"]),
                     normal_type=getattr(T.SpectralFilterBankNormalType,
                                         p["norm"]))
        C = obj.pwt(x)
    save(f"_fuzzwave{i}", re=C.real.astype(np.float32),
         im=C.imag.astype(np.float32),
         fre=np.asarray(obj.get_fre_band_arr(), np.float32),
         params=np.array(json.dumps(p)))


def gen_fuzz_wavelet():
    _gen_fuzz_group("_fuzzwave", len(_CWT_PARAM_CASES) + len(_PWT_CASES), "fuzz_wavelet")


def gen_fuzz_edges(af):
    """Non-contiguous band subsets: spectralObj_setEdgeArr golden cases
    (the fixed spectral goldens only exercise the contiguous set_edge)."""
    sigs = signals()
    out = {}
    x = sigs["sine"]
    mel = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512)
    spec = mel.spectrogram(x)
    fre = mel.get_fre_band_arr()
    out["in_spec"] = spec
    out["in_fre"] = fre
    edges = {
        "blocks": np.r_[5:15, 40:45, 100:110].astype(np.int32),
        "sparse": np.array([2, 7, 19, 53, 88, 120], np.int32),
    }
    for name, idx in edges.items():
        sp = af.Spectral(num=128, fre_band_arr=fre)
        sp.set_time_length(spec.shape[-1])
        sp.set_edge_arr(idx)
        out[f"{name}_idx"] = idx
        out[f"{name}_centroid"] = sp.centroid(spec)
        out[f"{name}_spread"] = sp.spread(spec)
        out[f"{name}_hfc"] = sp.hfc(spec)
        out[f"{name}_rms"] = sp.rms(spec)
        out[f"{name}_flux"] = sp.flux(spec)
        out[f"{name}_entropy"] = sp.entropy(spec, is_norm=True)
        out[f"{name}_eef"] = sp.eef(spec)
        v, f = sp.max(spec)
        out[f"{name}_max_v"], out[f"{name}_max_f"] = v, f
    save("fuzz_edges", **out)


def gen_fuzz_reassign(af):
    """Reassign re_type x window x padding sweep (fixed goldens only pin
    ALL and FRE with hann, no padding) + Synsq order=2 composition."""
    import json
    sigs = signals()
    out = {}
    x = sigs["sine"][:8192]
    T = af.type
    cases = [
        dict(re_type="TIME", window="HANN", pad=False, r2e=11, slide=512),
        dict(re_type="NONE", window="HANN", pad=False, r2e=11, slide=512),
        dict(re_type="ALL", window="HAMM", pad=True, r2e=11, slide=512),
        dict(re_type="FRE", window="BLACKMAN", pad=False, r2e=10,
             slide=256),
        dict(re_type="ALL", window="RECT", pad=False, r2e=11, slide=500),
    ]
    for i, p in enumerate(cases):
        rs = af.Reassign(radix2_exp=p["r2e"], samplate=32000,
                         window_type=getattr(T.WindowType, p["window"]),
                         slide_length=p["slide"],
                         re_type=getattr(T.ReassignType, p["re_type"]),
                         thresh=0.001, is_padding=p["pad"])
        D, _ = rs.reassign(x)
        out[f"c{i}_re"] = D.real.astype(np.float32)
        out[f"c{i}_im"] = D.imag.astype(np.float32)
        out[f"c{i}_params"] = np.array(json.dumps(p))

    # synsq order composition (fixed golden pins order=1 only)
    S = T.SpectralFilterBankScaleType
    W = T.WaveletContinueType
    cwt = af.CWT(num=84, radix2_exp=12, samplate=32000,
                 wavelet_type=W.MORSE, scale_type=S.OCTAVE)
    # clean 2-tone input: on noisy signals the unwrapped-phase rows
    # drift thousands of radians and the rounded reassignment index
    # becomes sensitive to the C's double-internal/float-stored unwrap
    # arithmetic (same libm/precision-drift class as the documented
    # phase-vocoder deviation); the chord keeps the order-composition
    # semantics testable bit-for-bit
    C = cwt.cwt(sigs["chord"][:4096])
    fre = cwt.get_fre_band_arr()
    sq = af.Synsq(num=84, radix2_exp=12, samplate=32000, order=2,
                  thresh=0.001)
    R = sq.synsq(C, S.OCTAVE, fre)
    out["synsq2_re"] = R.real.astype(np.float32)
    out["synsq2_im"] = R.imag.astype(np.float32)
    out["synsq2_in_re"] = C.real.astype(np.float32)
    out["synsq2_in_im"] = C.imag.astype(np.float32)
    out["synsq2_fre"] = np.asarray(fre, np.float32)
    save("fuzz_reassign", **out)


_PITCH_FUZZ_CASES = [
    dict(cls="PitchYIN", r2e=11, slide=512, low=40.0, high=1000.0),
    dict(cls="PitchYIN", r2e=13, slide=2048, low=27.0, high=2000.0),
    dict(cls="PitchNCF", r2e=11, slide=500, low=50.0, high=1000.0),
    dict(cls="PitchNCF", r2e=13, slide=2048, low=32.0, high=2000.0),
    dict(cls="PitchCEP", r2e=13, slide=2048, low=32.0, high=2000.0),
    dict(cls="PitchHPS", r2e=12, slide=512, low=50.0, high=1500.0),
    dict(cls="PitchLHS", r2e=11, slide=512, low=50.0, high=1500.0),
    dict(cls="PitchPEF", r2e=12, slide=1024, low=40.0, high=1800.0,
         kw=dict(cut_fre=3000.0, alpha=12.0, beta=0.3, gamma=2.0)),
    dict(cls="PitchSTFT", r2e=11, slide=512, low=60.0, high=1000.0,
         kw=dict(window_type="HANN")),
    dict(cls="PitchSTFT", r2e=12, slide=1000, low=32.0, high=2000.0),
]


def gen_fuzz_pitch_case(i):
    import json
    af = _setup_reference()
    p = dict(_PITCH_FUZZ_CASES[i])
    sr = 32000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
            + 0.12 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    kw = dict(p.get("kw", {}))
    if "window_type" in kw:
        kw["window_type"] = getattr(af.type.WindowType, kw["window_type"])
    obj = getattr(af, p["cls"])(samplate=sr, low_fre=p["low"],
                                high_fre=p["high"], radix2_exp=p["r2e"],
                                slide_length=p["slide"], **kw)
    res = obj.pitch(tone)
    fre = np.asarray(res[0] if isinstance(res, tuple) else res, np.float32)
    save(f"_fuzzpitch{i}", fre=fre, params=np.array(json.dumps(p)))


def gen_fuzz_pitch():
    _gen_fuzz_group("_fuzzpitch", len(_PITCH_FUZZ_CASES), "fuzz_pitch")


def gen_fuzz_onset(af):
    """Onset end-to-end for every novelty type (the fixed mir golden only
    pins FLUX).  PD/WPD/NWPD/CD/RCD take the STFT phase matrix."""
    sigs = signals()
    out = {}
    sr = 32000
    t = np.arange(sr) / sr
    tone = 0.6 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    x = tone.copy()
    for p in (4000, 12000, 20000, 28000):
        x[p:p+200] += (0.8 * np.random.default_rng(3)
                       .standard_normal(200)).astype(np.float32)
    x = x.astype(np.float32)
    out["in_x"] = x

    bft = af.BFT(num=128, radix2_exp=11, samplate=sr, slide_length=512,
                 scale_type=af.type.SpectralFilterBankScaleType.MEL,
                 data_type=af.type.SpectralDataType.POWER)
    spec = np.abs(bft.bft(x, result_type=1))
    out["spec"] = spec

    st = af.STFT(radix2_exp=11, window_type=af.type.WindowType.HANN,
                 slide_length=512)
    D = st.stft(x)
    mag = np.abs(D).astype(np.float32)
    phase = np.arctan2(D.imag, D.real).astype(np.float32)
    out["mag"] = mag
    out["phase"] = phase

    N = af.type.NoveltyType
    for nt in ("FLUX", "HFC", "SD", "SF", "MKL", "BROADBAND"):
        on = af.Onset(time_length=spec.shape[-1], fre_length=128,
                      slide_length=512, samplate=sr,
                      novelty_type=getattr(N, nt))
        point_arr, evn_arr, time_arr, value_arr = on.onset(spec)
        out[f"{nt}_points"] = np.asarray(point_arr, np.int64)
        out[f"{nt}_env"] = evn_arr
    for nt in ("PD", "WPD", "NWPD", "CD", "RCD"):
        on = af.Onset(time_length=mag.shape[-1], fre_length=mag.shape[0],
                      slide_length=512, samplate=sr,
                      novelty_type=getattr(N, nt))
        point_arr, evn_arr, time_arr, value_arr = on.onset(mag, phase)
        out[f"{nt}_points"] = np.asarray(point_arr, np.int64)
        out[f"{nt}_env"] = evn_arr
    save("fuzz_onset", **out)


def gen_fuzz_harmonic(af):
    """Harmonic peak-chain + HarmonicRatio under varied fft/slide/window/
    search-range parameters (the fixed goldens pin one config each)."""
    import json
    out = {}
    sr = 32000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
            + 0.12 * np.sin(2 * np.pi * 660 * t)
            + 0.01 * np.random.default_rng(5).standard_normal(sr)
            ).astype(np.float32)
    out["in_tone"] = tone
    W = af.type.WindowType
    cases = [
        dict(r2e=11, slide=512, window="HAMM", low=50.0, high=3000.0,
             q=(100.0, 2000.0)),
        dict(r2e=12, slide=2048, window="HANN", low=27.0, high=4000.0,
             q=(150.0, 1500.0)),
        dict(r2e=13, slide=1024, window="HAMM", low=30.0, high=2000.0,
             q=(80.0, 800.0)),
        # the C clamps windows beyond HAMM back to its HAMM default
        # (harmonic_algorithm.c:140-143) — pins the clamp behavior
        dict(r2e=11, slide=512, window="BLACKMAN", low=50.0, high=3000.0,
             q=(100.0, 2000.0)),
    ]
    for i, p in enumerate(cases):
        h = af.Harmonic(radix2_exp=p["r2e"], samplate=sr,
                        slide_length=p["slide"],
                        window_type=getattr(W, p["window"]),
                        low_fre=p["low"], high_fre=p["high"])
        out[f"h{i}_counts"] = np.asarray(
            h.harmonic_count(tone, *p["q"]), np.int64)
        out[f"h{i}_params"] = np.array(json.dumps(p))
    # HarmonicRatio: the C ctor NEVER reads its windowType argument
    # (harmonicRatio_algorithm.c:60, always Window_Hamm) — README
    # deviation 8; vary only fft/slide here
    for i, (r2e, slide) in enumerate([(11, 512), (12, 500), (13, 1024)]):
        hr = af.HarmonicRatio(samplate=sr, radix2_exp=r2e,
                              slide_length=slide)
        out[f"r{i}_hr"] = hr.harmonic_ratio(tone)
        out[f"r{i}_params"] = np.array(json.dumps(
            dict(r2e=r2e, slide=slide)))
    save("fuzz_harmonic", **out)


# chroma_octave is absent: the reference one-shot corrupts its heap
# ("malloc(): corrupted top size") even at default parameters on this box
_CHROMA_FUZZ_CASES = [
    dict(fn="chroma_linear", kw=dict(radix2_exp=11, slide_length=512)),
    dict(fn="chroma_linear", kw=dict(radix2_exp=12, slide_length=1024,
                                     low_fre=100.0, high_fre=8000.0)),
    dict(fn="chroma_linear", kw=dict(radix2_exp=12, slide_length=1000,
                                     chroma_num=24)),
    dict(fn="chroma_cqt", kw=dict(num=84, bin_per_octave=12)),
    dict(fn="chroma_cqt", kw=dict(num=144, bin_per_octave=24,
                                  chroma_num=12)),
    dict(fn="chroma_cqt", kw=dict(num=60, bin_per_octave=12,
                                  low_fre=65.41)),
]


def _chroma_fuzz_signal():
    sr = 32000
    t = np.arange(sr) / sr
    return (0.3 * np.sin(2 * np.pi * 261.63 * t)
            + 0.3 * np.sin(2 * np.pi * 392.0 * t)
            + 0.02 * np.random.default_rng(9).standard_normal(sr)
            ).astype(np.float32)


def gen_fuzz_chroma_case(i):
    """chroma_linear/chroma_octave/chroma_cqt one-shots under varied
    parameters; one subprocess per case (the one-shots corrupt the
    reference heap when run back-to-back in one process)."""
    import json
    af = _setup_reference()
    p = dict(_CHROMA_FUZZ_CASES[i])
    arr = getattr(af, p["fn"])(_chroma_fuzz_signal(), samplate=32000,
                               **p["kw"])
    save(f"_fuzzchroma{i}", arr=np.asarray(arr, np.float32),
         params=np.array(json.dumps(p)))


def gen_fuzz_chroma():
    _gen_fuzz_group("_fuzzchroma", len(_CHROMA_FUZZ_CASES), "fuzz_chroma")

# Every core.py one-shot at default-ish + one varied config — the
# wrapper bodies hide quirks the class-level goldens can't see (e.g.
# chroma_cqt's complex-square).  chroma_* have their own group.
_CORE_FUZZ_CASES = [
    dict(fn="linear_spectrogram", kw=dict(radix2_exp=11, slide_length=512)),
    dict(fn="linear_spectrogram", kw=dict(radix2_exp=10, slide_length=256)),
    dict(fn="mel_spectrogram", kw=dict(num=128, radix2_exp=11,
                                       slide_length=512)),
    dict(fn="mel_spectrogram", kw=dict(num=64, radix2_exp=12,
                                       slide_length=1000)),
    dict(fn="bark_spectrogram", kw=dict(num=64, radix2_exp=11,
                                        slide_length=512)),
    dict(fn="erb_spectrogram", kw=dict(num=64, radix2_exp=11,
                                       slide_length=512)),
    dict(fn="mfcc", kw=dict(cc_num=13, radix2_exp=11, slide_length=512)),
    dict(fn="mfcc", kw=dict(cc_num=20, mel_num=64, radix2_exp=12,
                            slide_length=1024)),
    dict(fn="bfcc", kw=dict(cc_num=13, radix2_exp=11, slide_length=512)),
    dict(fn="gtcc", kw=dict(cc_num=13, radix2_exp=11, slide_length=512)),
    dict(fn="cqcc", kw=dict(cc_num=13, cqt_num=84)),
    dict(fn="cqt", kw=dict(num=84)),
    dict(fn="cqt", kw=dict(num=96, bin_per_octave=24, low_fre=65.41)),
    dict(fn="vqt", kw=dict(num=84)),
]


def gen_fuzz_core_case(i):
    import json
    af = _setup_reference()
    p = dict(_CORE_FUZZ_CASES[i])
    x = signals()["sine"]
    res = getattr(af, p["fn"])(x, samplate=32000, **p["kw"])
    # one-shots return (matrix, fre_band_arr)
    arr, fre = (res if isinstance(res, tuple) else (res, None))
    arr = np.asarray(arr)
    out = {"params": np.array(json.dumps(p))}
    if np.iscomplexobj(arr):
        out["re"] = arr.real.astype(np.float32)
        out["im"] = arr.imag.astype(np.float32)
    else:
        out["arr"] = arr.astype(np.float32)
    if fre is not None:
        out["fre"] = np.asarray(fre, np.float32)
    save(f"_fuzzcore{i}", **out)


def gen_fuzz_core():
    _gen_fuzz_group("_fuzzcore", len(_CORE_FUZZ_CASES), "fuzz_core")

def gen_fuzz_extractor(af):
    """FeatureExtractor facade vs ours: spectrogram dict + spectral/xxcc
    stages over several transform backends at once."""
    import json
    out = {}
    sigs = signals()
    x = sigs["sine"][:8192]
    S = af.type.SpectralFilterBankScaleType
    fe = af.FeatureExtractor(transforms=["bft", "cwt", "pwt"], num=64,
                             radix2_exp=11, samplate=32000,
                             slide_length=512, scale_type=S.MEL)
    spec_res = fe.spectrogram(x)
    for name in ("bft", "cwt", "pwt"):
        arr = np.asarray(spec_res[name])
        if np.iscomplexobj(arr):
            out[f"{name}_re"] = arr.real.astype(np.float32)
            out[f"{name}_im"] = arr.imag.astype(np.float32)
        else:
            out[f"{name}_arr"] = arr.astype(np.float32)
    sp = fe.spectral(spec_res, spectral="flux")
    for name in ("bft", "cwt", "pwt"):
        out[f"{name}_flux"] = np.asarray(sp[name], np.float32)
    cc = fe.xxcc(spec_res, cc_num=13)
    for name in ("bft", "cwt", "pwt"):
        out[f"{name}_cc"] = np.asarray(cc[name], np.float32)
    save("fuzz_extractor", **out)

_RESAMPLE_FUZZ_CASES = [
    dict(q="BEST", src=32000, dst=16000, is_scale=False),
    dict(q="MID", src=32000, dst=16000, is_scale=True),
    dict(q="FAST", src=32000, dst=16000, is_scale=False),
    dict(q="BEST", src=48000, dst=32000, is_scale=False),   # p=2 q=3
    dict(q="MID", src=24000, dst=32000, is_scale=False),    # upsample 4/3
    dict(q="FAST", src=32000, dst=44100, is_scale=True),    # 441/320
]


def gen_fuzz_resample_case(i):
    import json
    af = _setup_reference()
    p = dict(_RESAMPLE_FUZZ_CASES[i])
    x = signals()["sine"][:9000]
    rs = af.Resample(qual_type=getattr(af.type.ResampleQualityType, p["q"]),
                     is_scale=p["is_scale"])
    rs.set_samplate(p["src"], p["dst"])
    y = np.asarray(rs.resample(x), np.float32)
    save(f"_fuzzresample{i}", y=y, params=np.array(json.dumps(p)))


def gen_fuzz_resample():
    _gen_fuzz_group("_fuzzresample", len(_RESAMPLE_FUZZ_CASES),
                    "fuzz_resample")

def gen_fuzz_utils(af):
    """Every pure-Python utility in the reference wrapper, golden-compared
    on fixed random inputs (the class-level goldens never exercise these
    directly)."""
    rng = np.random.default_rng(42)
    spec = (rng.random((64, 40)).astype(np.float32) * 3.0 + 1e-6)
    D = (rng.standard_normal((33, 20)) + 1j * rng.standard_normal((33, 20))
         ).astype(np.complex64)
    fre = np.linspace(20.0, 16000.0, 128).astype(np.float32)
    midi = np.arange(21, 109, dtype=np.float32)
    U = af.utils
    out = {"in_spec": spec, "in_d_re": D.real, "in_d_im": D.imag,
           "in_fre": fre}
    out["power_to_db"] = U.power_to_db(spec)
    out["power_to_db_m40"] = U.power_to_db(spec, min_db=-40)
    out["power_to_abs_db"] = U.power_to_abs_db(spec)
    out["power_to_abs_db_norm"] = U.power_to_abs_db(spec, fft_length=2048,
                                                    is_norm=True)
    out["mag_to_abs_db"] = U.mag_to_abs_db(spec)
    out["log_compress"] = U.log_compress(spec, gamma=5.0)
    out["log10_compress"] = U.log10_compress(spec, gamma=5.0)
    tdb = U.temproal_db(spec[0], base=18.0)  # returns (db_arr, energy)
    out["temproal_db"] = np.asarray(tdb[0], np.float32)
    out["temproal_db_energy"] = np.asarray(tdb[1], np.float32)
    out["delta_9"] = U.delta(spec, order=9)
    out["delta_5"] = U.delta(spec, order=5)
    out["get_phase"] = U.get_phase(D)
    out["midi_to_hz"] = np.asarray(U.midi_to_hz(midi), np.float64)
    out["hz_to_midi"] = np.asarray(U.hz_to_midi(fre), np.float64)
    out["note_vals"] = np.array([U.note_to_midi(n) for n in
                                 ("C1", "A4", "G#3", "Bb5", "F#2")],
                                np.float64)
    out["min_max"] = U.min_max_scale(spec)
    out["stand"] = U.stand_scale(spec)
    out["max_abs"] = U.max_abs_scale(spec)
    out["robust"] = U.robust_scale(spec)
    out["center"] = U.center_scale(spec)
    out["mean"] = U.mean_scale(spec)
    out["arctan"] = U.arctan_scale(spec)
    out["wa"] = np.asarray(U.auditory_weight_a(fre), np.float32)
    out["wb"] = np.asarray(U.auditory_weight_b(fre), np.float32)
    out["wc"] = np.asarray(U.auditory_weight_c(fre), np.float32)
    out["wd"] = np.asarray(U.auditory_weight_d(fre), np.float32)
    out["qf2"] = np.array(U.queue_fre2(220.0, 446.0), np.float64)
    out["qf3"] = np.array(U.queue_fre3(220.0, 446.0, 655.0), np.float64)
    save("fuzz_utils", **out)


# Feature/auxiliary-transform parameter sweep: xxcc/deconv/temporal/
# cepstrogram/st/fst only have fixed-configuration goldens; these walk
# their knobs (num, cc_num, rectify, delta window, frame/slide, window
# type, cep_num, index ranges, factor/norm).  One subprocess per case.
_FEAT_FUZZ_CASES = [
    dict(kind="xxcc", num=64, r2e=11, slide=512, cc=20, rectify="LOG"),
    dict(kind="xxcc", num=256, r2e=12, slide=1024, cc=13,
         rectify="CUBIC_ROOT"),
    dict(kind="xxcc_std", num=128, r2e=11, slide=512, cc=8, dwl=3),
    dict(kind="xxcc_std", num=128, r2e=11, slide=512, cc=14, dwl=15),
    dict(kind="deconv", num=64, r2e=11, slide=512),
    dict(kind="deconv", num=256, r2e=12, slide=1024),
    dict(kind="temporal", frame=1024, slide=256, window="HAMM"),
    dict(kind="temporal", frame=2000, slide=500, window="RECT"),
    dict(kind="cepstrogram", r2e=10, slide=256, window="HANN", cep=64),
    dict(kind="cepstrogram", r2e=12, slide=1024, window="HAMM", cep=4),
    dict(kind="st", r2e=9, mn=3, mx=200, factor=0.5, norm=1.5),
    dict(kind="st", r2e=11, mn=50, mx=300, factor=3.0, norm=0.3),
    dict(kind="fst", r2e=9, mn=20, mx=250),
    dict(kind="fst", r2e=11, mn=1, mx=900),
]


def gen_fuzz_features_case(i):
    import json
    af = _setup_reference()
    p = dict(_FEAT_FUZZ_CASES[i])
    x = signals()["chord"]
    out = {"params": np.array(json.dumps(p))}
    kind = p["kind"]
    if kind in ("xxcc", "xxcc_std", "deconv"):
        mel = af.MelSpectrogram(num=p["num"], samplate=32000,
                                radix2_exp=p["r2e"],
                                slide_length=p["slide"])
        spec = mel.spectrogram(x)
        out["in_spec"] = spec
        if kind == "deconv":
            dc = af.Deconv(num=p["num"])
            dc.set_time_length(spec.shape[-1])
            timbre, pitch = dc.deconv(spec)
            out["timbre"], out["pitch"] = timbre, pitch
        else:
            xx = af.XXCC(num=p["num"])
            xx.set_time_length(spec.shape[-1])
            if kind == "xxcc":
                rt = getattr(af.type.CepstralRectifyType, p["rectify"])
                out["arr"] = xx.xxcc(spec, cc_num=p["cc"], rectify_type=rt)
            else:
                rng = np.random.default_rng(100 + i)
                energy = rng.uniform(0.1, 5.0, spec.shape[-1]).astype(
                    np.float32)
                out["in_energy"] = energy
                coe, d1, d2 = xx.xxcc_standard(
                    spec, energy, cc_num=p["cc"],
                    delta_window_length=p["dwl"],
                    energy_type=af.type.CepstralEnergyType.REPLACE)
                out["coe"], out["d1"], out["d2"] = coe, d1, d2
    elif kind == "temporal":
        tp = af.Temporal(frame_length=p["frame"], slide_length=p["slide"],
                         window_type=getattr(af.type.WindowType,
                                             p["window"]))
        res = tp.temporal(x, has_energy=True, has_rms=True, has_zcr=True,
                          has_m=True)
        out["energy"] = res["energy_arr"]
        out["rms"] = res["rms_arr"]
        out["zcr"] = res["zcr_arr"]
        out["m"] = res["m_arr"]
    elif kind == "cepstrogram":
        # noisy input: the pure 2-tone chord has deep windowed-spectrum
        # nulls that land on the C's log(max(p,1e-16)) clamp, where a
        # one-ulp FFT difference flips log by tens of units (same
        # rounding-knife-edge class as the documented phase-vocoder
        # drift); the noise floor keeps every power cell well above it
        cp = af.Cepstrogram(radix2_exp=p["r2e"], samplate=32000,
                            window_type=getattr(af.type.WindowType,
                                                p["window"]),
                            slide_length=p["slide"])
        c1, c2, c3 = cp.cepstrogram(signals()["sine"], cep_num=p["cep"])
        out["ceps"], out["env"], out["det"] = c1, c2, c3
    elif kind == "st":
        st = af.ST(radix2_exp=p["r2e"], min_index=p["mn"],
                   max_index=p["mx"], factor=p["factor"], norm=p["norm"])
        C = st.st(x[:1 << p["r2e"]])
        out["re"] = C.real.astype(np.float32)
        out["im"] = C.imag.astype(np.float32)
    elif kind == "fst":
        fst = af.FST(radix2_exp=p["r2e"], min_index=p["mn"],
                     max_index=p["mx"], samplate=32000)
        C = fst.fst(x[:1 << p["r2e"]])
        out["re"] = C.real.astype(np.float32)
        out["im"] = C.imag.astype(np.float32)
    save(f"_fuzzfeat{i}", **out)


def gen_fuzz_features():
    _gen_fuzz_group("_fuzzfeat", len(_FEAT_FUZZ_CASES), "fuzz_features")


# Spectral-feature parameter sweep: the fixed `spectral` golden runs all
# ~30 methods but nearly always at default kwargs and on one mel
# spectrogram shape.  These cases randomize the spectrum shape, the
# frequency bands, the contiguous edge window, and every method knob
# (flux step/p/positive/exp/tp, rolloff threshold, entropy norm, energy
# log/gamma, band_width p, sd/sf step/positive, mkl tp, broadband
# threshold, novelty method x data x step x threshold, eef/eer norm).
N_SPECTRAL_FUZZ = 10


def _spectral_fuzz_inputs(i):
    """Deterministic per-case inputs + kwargs (also reread by the test
    via the saved params JSON, so only the arrays need to round-trip)."""
    rng = np.random.default_rng(250818 + 7 * i)
    num = int(rng.choice([24, 48, 96, 160]))
    T = int(rng.integers(16, 60))
    scale = float(rng.choice([1e-3, 0.5, 3.0, 40.0]))
    spec = (rng.random((num, T)) * scale + 1e-6).astype(np.float32)
    f0 = float(rng.uniform(20.0, 200.0))
    df = rng.uniform(10.0, 120.0, num - 1)
    fre = np.concatenate([[f0], f0 + np.cumsum(df)]).astype(np.float32)
    phase = rng.uniform(-np.pi, np.pi, (num, T)).astype(np.float32)
    use_edge = bool(i % 2)
    start = int(rng.integers(0, num // 4)) if use_edge else 0
    end = int(rng.integers(3 * num // 4, num)) if use_edge else num - 1
    p = dict(num=num, T=T, start=start, end=end,
             flux_step=int(rng.integers(1, 5)),
             flux_p=float(rng.choice([0.5, 1.0, 2.0, 3.0])),
             flux_pos=bool(rng.integers(2)), flux_exp=bool(rng.integers(2)),
             flux_tp=int(rng.integers(2)),
             rolloff_th=float(rng.uniform(0.05, 0.99)),
             ent_norm=bool(rng.integers(2)),
             en_log=bool(rng.integers(2)),
             en_gamma=float(rng.choice([1.0, 10.0, 25.0])),
             bw_p=float(rng.choice([1.0, 2.0, 3.0])),
             sd_step=int(rng.integers(1, 4)),
             sd_pos=bool(rng.integers(2)),
             sf_step=int(rng.integers(1, 4)),
             sf_pos=bool(rng.integers(2)),
             mkl_tp=int(rng.integers(2)),
             bb_th=float(rng.uniform(0.0, 0.5)),
             nov_step=int(rng.integers(1, 4)),
             nov_th=float(rng.choice([0.0, 0.1, 0.5])),
             nov_m=int(rng.integers(4)), nov_d=int(rng.integers(2)),
             eef_norm=bool(rng.integers(2)),
             eer_norm=bool(rng.integers(2)),
             eer_gamma=float(rng.choice([0.5, 1.0, 10.0])))
    return spec, fre, phase, p


def gen_fuzz_spectral_case(i):
    import json
    af = _setup_reference()
    spec, fre, phase, p = _spectral_fuzz_inputs(i)
    T = af.type
    sp = af.Spectral(num=p["num"], fre_band_arr=fre)
    sp.set_time_length(p["T"])
    sp.set_edge(p["start"], p["end"])
    out = {"in_spec": spec, "in_fre": fre, "in_phase": phase,
           "params": np.array(json.dumps(p))}
    out["flux"] = sp.flux(spec, step=p["flux_step"], p=p["flux_p"],
                          is_positive=p["flux_pos"], is_exp=p["flux_exp"],
                          tp=p["flux_tp"])
    out["rolloff"] = sp.rolloff(spec, threshold=p["rolloff_th"])
    out["entropy"] = sp.entropy(spec, is_norm=p["ent_norm"])
    out["energy"] = sp.energy(spec, is_log=p["en_log"], gamma=p["en_gamma"])
    out["band_width"] = sp.band_width(spec, p=p["bw_p"])
    out["sd"] = sp.sd(spec, step=p["sd_step"], is_positive=p["sd_pos"])
    out["sf"] = sp.sf(spec, step=p["sf_step"], is_positive=p["sf_pos"])
    out["mkl"] = sp.mkl(spec, tp=p["mkl_tp"])
    out["broadband"] = sp.broadband(spec, threshold=p["bb_th"])
    out["novelty"] = sp.novelty(
        spec, step=p["nov_step"], threshold=p["nov_th"],
        method_type=T.SpectralNoveltyMethodType(p["nov_m"]),
        data_type=T.SpectralNoveltyDataType(p["nov_d"]))
    out["eef"] = sp.eef(spec, is_norm=p["eef_norm"])
    out["eer"] = sp.eer(spec, is_norm=p["eer_norm"], gamma=p["eer_gamma"])
    for name in ("flatness", "centroid", "spread", "skewness", "kurtosis",
                 "crest", "slope", "decrease", "rms", "hfc"):
        out[name] = getattr(sp, name)(spec)
    for name in ("max", "mean", "var"):
        v, f = getattr(sp, name)(spec)
        out[f"{name}_v"], out[f"{name}_f"] = v, f
    for name in ("pd", "wpd", "nwpd", "cd", "rcd"):
        out[name] = getattr(sp, name)(spec, phase)
    save(f"_fuzzspectral{i}", **out)


def gen_fuzz_spectral():
    _gen_fuzz_group("_fuzzspectral", N_SPECTRAL_FUZZ, "fuzz_spectral")


# --- fixed groups for goldens originally committed without a generator ---
# (classic/dsp/harmonic/pitch_ffp/pitch_stft were produced by one-off
# scripts in round 1; these reproduce them so `all` regenerates the full
# fixture set per machine.)

def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _harm_tone(amps, noise_seed, f0=220.0, sr=32000):
    t = np.arange(sr) / sr
    x = sum(a * np.sin(2 * np.pi * f0 * (i + 1) * t)
            for i, a in enumerate(amps))
    x = x + 0.01 * np.random.default_rng(noise_seed).standard_normal(sr)
    return x.astype(np.float32)


def gen_classic():
    """NMF (C `nmf` symbol, src/classic/nmf.c) + Viterbi (src/classic/
    viterbi.c) fixtures for tests/test_classic.py."""
    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    r = np.random.default_rng(0)
    V = r.random((16, 20)).astype(np.float32)
    W0 = r.random((16, 4)).astype(np.float32)
    H0 = r.random((4, 20)).astype(np.float32)
    W, H = W0.copy(), H0.copy()
    lib["nmf"](_f32p(V), ctypes.c_int(16), ctypes.c_int(20), ctypes.c_int(4),
               _f32p(W), _f32p(H),
               ctypes.byref(ctypes.c_int(100)), ctypes.byref(ctypes.c_int(0)),
               ctypes.byref(ctypes.c_float(1e-4)),
               ctypes.byref(ctypes.c_int(0)))

    pi = np.array([0.5, 0.3, 0.2], np.float32)
    A = np.array([[0.6, 0.3, 0.1], [0.2, 0.5, 0.3], [0.1, 0.3, 0.6]],
                 np.float32)
    B = np.array([[0.7, 0.2, 0.1], [0.2, 0.5, 0.3], [0.05, 0.15, 0.8]],
                 np.float32)
    o = np.array([0, 1, 2, 2, 1, 0, 0, 2], np.int32)
    s = np.zeros(8, np.int32)
    m = np.zeros((8, 3), np.float32)
    idx = np.zeros((8, 3), np.int32)
    vit = lib["viterbi"]
    vit.restype = ctypes.c_float
    prob = vit(_f32p(pi), _f32p(A), _f32p(B), ctypes.c_int(3),
               ctypes.c_int(3), _i32p(o), ctypes.c_int(8), None,
               _i32p(s), _f32p(m), _i32p(idx))
    # HMM (src/classic/hmm.c): Baum-Welch trajectory + forward likelihood
    # + decode, driven via ctypes.  Quirks: hmmObj_init only swaps in the
    # caller's matrices when each float32 row sum is EXACTLY 1.0 (it
    # compares `sum==1.0`, hmm.c:84-116), so the fixtures are dyadic
    # rationals; init also takes OWNERSHIP of the passed numpy buffers
    # (train's memcpy then updates them in place — we read the trained
    # params straight out of our arrays) so the object must never be
    # freed here (the group subprocess exits instead).
    hpi = np.array([0.5, 0.25, 0.25], np.float32)
    hA = np.array([[0.5, 0.25, 0.25],
                   [0.25, 0.5, 0.25],
                   [0.125, 0.375, 0.5]], np.float32)
    hB = np.array([[0.75, 0.125, 0.125],
                   [0.25, 0.5, 0.25],
                   [0.125, 0.25, 0.625]], np.float32)
    ho = np.array([0, 0, 1, 2, 2, 2, 1, 0, 0, 1, 2, 2, 0, 1, 1, 2, 0, 0,
                   2, 1, 0, 2, 2, 1], np.int32)
    hobj = ctypes.c_void_p()
    lib["hmmObj_new"](ctypes.byref(hobj), ctypes.c_int(3), ctypes.c_int(3))
    lib["hmmObj_init"](hobj, _f32p(hpi), _f32p(hA), _f32p(hB))
    pred = lib["hmmObj_predict"]
    pred.restype = ctypes.c_float
    p0 = pred(hobj, _i32p(ho), ctypes.c_int(len(ho)))
    # per-iteration trajectory: 10 single-step trains (error=0 disables
    # the early break), reading the in-place-updated matrices after each
    traj_pi, traj_A, traj_B, traj_p = [], [], [], []
    for _ in range(10):
        lib["hmmObj_train"](hobj, _i32p(ho), ctypes.c_int(len(ho)),
                            ctypes.byref(ctypes.c_int(1)),
                            ctypes.byref(ctypes.c_float(0.0)))
        traj_pi.append(hpi.copy())
        traj_A.append(hA.copy())
        traj_B.append(hB.copy())
        traj_p.append(pred(hobj, _i32p(ho), ctypes.c_int(len(ho))))
    dec = lib["hmmObj_decode"]
    dec.restype = ctypes.c_float
    hs = np.zeros(len(ho), np.int32)
    hm = np.zeros((len(ho), 3), np.float32)
    hprob = dec(hobj, _i32p(ho), ctypes.c_int(len(ho)), _i32p(hs),
                _f32p(hm))

    save("classic", V=V, W0=W0, H0=H0, W=W, H=H, pi=pi, A=A, B=B, o=o,
         vit_s=s, vit_prob=np.float32(prob), vit_m=m,
         hmm_pi0=np.array([0.5, 0.25, 0.25], np.float32),
         hmm_A0=np.array([[0.5, 0.25, 0.25], [0.25, 0.5, 0.25],
                          [0.125, 0.375, 0.5]], np.float32),
         hmm_B0=np.array([[0.75, 0.125, 0.125], [0.25, 0.5, 0.25],
                          [0.125, 0.25, 0.625]], np.float32),
         hmm_o=ho, hmm_p0=np.float32(p0),
         hmm_traj_pi=np.stack(traj_pi), hmm_traj_A=np.stack(traj_A),
         hmm_traj_B=np.stack(traj_B),
         hmm_traj_p=np.asarray(traj_p, np.float32),
         hmm_dec_s=hs, hmm_dec_m=hm, hmm_dec_prob=np.float32(hprob))


def gen_dsp(af):
    """Xcorr (Python wrapper) + Hilbert/DCT (ctypes: no reference Python
    wrapper exists) fixtures for tests/test_dsp.py."""
    r = np.random.default_rng(5)
    x = r.standard_normal(256).astype(np.float32)
    y = r.standard_normal(256).astype(np.float32)
    xc = af.Xcorr()
    # the reference wrapper returns (arr, max_val); the max-lag index the
    # test pins is the argmax of the returned correlation
    out, _val = xc.xcorr(x, y, af.type.XcorrNormalType.COEFF)
    idx = int(np.argmax(out))
    auto, _v2 = xc.xcorr(x, xcorr_normal_type=af.type.XcorrNormalType.COEFF)

    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    ho = ctypes.c_void_p()
    lib["hilbertObj_new"](ctypes.byref(ho), ctypes.c_int(8))
    hr = np.zeros(256, np.float32)
    hi = np.zeros(256, np.float32)
    lib["hilbertObj_hilbert"](ho, _f32p(x), _f32p(hr), _f32p(hi))

    do = ctypes.c_void_p()
    lib["dctObj_new"](ctypes.byref(do), ctypes.c_int(64), None)
    dct_in = x[:64].copy()
    dct_out = np.zeros(64, np.float32)
    lib["dctObj_dct"](do, _f32p(dct_in), ctypes.c_int(1), _f32p(dct_out))

    save("dsp", x=x, y=y, xcorr=out, xcorr_idx=np.int64(idx),
         autocorr=auto, hilb_re=hr, hilb_im=hi,
         dct_in=dct_in, dct_out=dct_out)


def gen_harmonic(af):
    x = _harm_tone([0.5, 0.3, 0.2, 0.1], noise_seed=0)
    h = af.Harmonic(samplate=32000, radix2_exp=12)
    counts = h.harmonic_count(x, 100.0, 2000.0)
    save("harmonic", x=x, counts=np.asarray(counts))


def gen_pitch_ffp(af):
    x = _harm_tone([0.5, 0.3, 0.2], noise_seed=2)
    p = af.PitchFFP(samplate=32000, radix2_exp=12, slide_length=1024)
    fre, db = p.pitch(x)
    save("pitch_ffp", x=x, fre=fre, db=db)


def gen_pitch_stft(af):
    x = _harm_tone([0.5, 0.3, 0.2, 0.1], noise_seed=1)
    p = af.PitchSTFT(samplate=32000, radix2_exp=12, slide_length=1024)
    fre, db = p.pitch(x)
    save("pitch_stft", x=x, fre=fre, db=db)


# MIR post-processing / classic-ML parameter sweep: time_stretch,
# pitch_shift, HPSS, HarmonicRatio, NMF, Viterbi only have one fixed
# configuration each; these walk their knobs.  One subprocess per case.
_MIR2_FUZZ_CASES = [
    dict(kind="ts", r2e=10, slide=256, window="HANN", rate=0.6),
    dict(kind="ts", r2e=12, slide=1024, window="HAMM", rate=1.9),
    dict(kind="ts", r2e=11, slide=512, window="HANN", rate=1.12),
    dict(kind="ps", r2e=11, slide=512, window="HANN", semitone=-4),
    dict(kind="ps", r2e=12, slide=1024, window="HANN", semitone=7),
    dict(kind="hpss", r2e=11, window="HANN", slide=512, h=11, p=17),
    dict(kind="hpss", r2e=12, window="HAMM", slide=1024, h=31, p=9),
    dict(kind="hpss", r2e=10, window="RECT", slide=256, h=5, p=5),
    dict(kind="hr", r2e=11, slide=256),
    dict(kind="hr", r2e=12, slide=2048),
    dict(kind="nmf", k=2, tp=1, it=120, norm=1),
    dict(kind="nmf", k=8, tp=2, it=100, norm=0),
    dict(kind="viterbi", n=4, T=12, seed=11),
    dict(kind="viterbi", n=6, T=30, seed=12),
]


def gen_fuzz_mir2_case(i):
    import json
    p = dict(_MIR2_FUZZ_CASES[i])
    out = {"params": np.array(json.dumps(p))}
    kind = p["kind"]
    sr = 32000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    if kind in ("ts", "ps", "hr"):
        af = _setup_reference()
        W = af.type.WindowType
        if kind == "ts":
            ts = af.TimeStretch(radix2_exp=p["r2e"], slide_length=p["slide"],
                                window_type=getattr(W, p["window"]))
            out["y"] = ts.time_stretch(tone, p["rate"])
        elif kind == "ps":
            ps = af.PitchShift(radix2_exp=p["r2e"], slide_length=p["slide"],
                               window_type=getattr(W, p["window"]))
            out["y"] = ps.pitch_shift(tone, p["semitone"], sr)
        else:
            hr = af.HarmonicRatio(samplate=sr, radix2_exp=p["r2e"],
                                  slide_length=p["slide"])
            out["y"] = hr.harmonic_ratio(tone)
    elif kind == "hpss":
        af = _setup_reference()
        x = tone.copy()
        for pos in (4000, 12000, 20000, 28000):
            x[pos:pos + 200] += (0.8 * np.random.default_rng(3)
                                 .standard_normal(200)).astype(np.float32)
        out["in_x"] = x
        hp = af.HPSS(radix2_exp=p["r2e"],
                     window_type=getattr(af.type.WindowType, p["window"]),
                     slide_length=p["slide"], h_order=p["h"],
                     p_order=p["p"])
        h, perc = hp.hpss(x)
        out["h"], out["p"] = h, perc
    elif kind == "nmf":
        lib = ctypes.cdll.LoadLibrary(REF_LIB)
        r = np.random.default_rng(200 + i)
        V = r.random((24, 32)).astype(np.float32)
        k = p["k"]
        W0 = r.random((24, k)).astype(np.float32)
        H0 = r.random((k, 32)).astype(np.float32)
        W, H = W0.copy(), H0.copy()
        lib["nmf"](_f32p(V), ctypes.c_int(24), ctypes.c_int(32),
                   ctypes.c_int(k), _f32p(W), _f32p(H),
                   ctypes.byref(ctypes.c_int(p["it"])),
                   ctypes.byref(ctypes.c_int(p["tp"])),
                   ctypes.byref(ctypes.c_float(1e-5)),
                   ctypes.byref(ctypes.c_int(p["norm"])))
        out.update(V=V, W0=W0, H0=H0, W=W, H=H)
    elif kind == "viterbi":
        lib = ctypes.cdll.LoadLibrary(REF_LIB)
        r = np.random.default_rng(p["seed"])
        n, T = p["n"], p["T"]
        pi = r.random(n).astype(np.float32)
        pi /= pi.sum()
        A = r.random((n, n)).astype(np.float32)
        A /= A.sum(axis=1, keepdims=True)
        B = r.random((n, n)).astype(np.float32)
        B /= B.sum(axis=1, keepdims=True)
        o = r.integers(0, n, T).astype(np.int32)
        s = np.zeros(T, np.int32)
        m = np.zeros((T, n), np.float32)
        idx = np.zeros((T, n), np.int32)
        vit = lib["viterbi"]
        vit.restype = ctypes.c_float
        prob = vit(_f32p(pi), _f32p(A), _f32p(B), ctypes.c_int(n),
                   ctypes.c_int(n), _i32p(o), ctypes.c_int(T), None,
                   _i32p(s), _f32p(m), _i32p(idx))
        out.update(pi=pi, A=A, B=B, o=o, vit_s=s,
                   vit_prob=np.float32(prob), vit_m=m)
    save(f"_fuzzmir2{i}", **out)


def gen_fuzz_mir2():
    _gen_fuzz_group("_fuzzmir2", len(_MIR2_FUZZ_CASES), "fuzz_mir2")


# STFT/ISTFT parameter sweep: the fixed `stft` golden pins one config
# (r2e=11, HANN, slide 512) plus five padding variants.  These cases walk
# radix2_exp x window type (all 14) x slide x padding position/mode/values
# x custom window data x odd signal lengths, and reconstruct via both
# istft methods (weighted-window and plain OLA) where the overlap covers
# the signal (slide <= fft/2 — larger slides leave zero-weight samples
# the weighted method divides by).


def _stft_fuzz_cases():
    rng = np.random.default_rng(260819)
    cases = []
    for i in range(14):
        r2e = int(rng.choice([8, 9, 10, 11, 12]))
        fft = 1 << r2e
        slide = int(rng.choice([fft // 4, fft // 2, fft // 4 + 36, fft]))
        cases.append(dict(
            r2e=r2e, slide=slide, window=int(rng.integers(14)),
            pad=int(rng.integers(2)), pos=int(rng.integers(3)),
            mode=int(rng.integers(3)),
            v1=float(np.round(rng.uniform(-0.3, 0.3), 3)),
            v2=float(np.round(rng.uniform(-0.3, 0.3), 3)),
            n=int(rng.choice([32000, 20000, 12345])),
            method=int(rng.integers(2)),
            custom=int(rng.integers(4) == 0)))
    return cases


_STFT_FUZZ_CASES = _stft_fuzz_cases()


def gen_fuzz_stft_case(i):
    import json
    af = _setup_reference()
    p = _STFT_FUZZ_CASES[i]
    x = signals()["sine"][:p["n"]]
    st = af.STFT(radix2_exp=p["r2e"],
                 window_type=af.type.WindowType(p["window"]),
                 slide_length=p["slide"])
    out = {"params": np.array(json.dumps(p))}
    if p["custom"]:
        w = (0.2 + np.random.default_rng(900 + i)
             .random(1 << p["r2e"])).astype(np.float32)
        st.use_window_data_arr(w)
        out["win"] = w
    if p["pad"]:
        st.enable_padding(True)
        st.set_padding(af.type.PaddingPositionType(p["pos"]),
                       af.type.PaddingModeType(p["mode"]), p["v1"], p["v2"])
    D = st.stft(x)
    out["re"] = D.real.astype(np.float32)
    out["im"] = D.imag.astype(np.float32)
    if p["slide"] <= (1 << p["r2e"]) // 2:
        out["rec"] = np.asarray(st.istft(D, method_type=p["method"]),
                                np.float32)
    save(f"_fuzzstft{i}", **out)


def gen_fuzz_stft():
    _gen_fuzz_group("_fuzzstft", len(_STFT_FUZZ_CASES), "fuzz_stft")


# DSP one-shot parameter sweep: hilbert/dct/xcorr driven through the C
# symbols (their fixed goldens pin a single size each); czt and conv have
# no C oracle here (the reference CZT reads 2N floats from an N buffer —
# documented deviation 3 — so its output is undefined-behavior garbage)
# and get float64 direct-definition goldens instead.


def _dsp_fuzz_cases():
    rng = np.random.default_rng(260820)
    cases = []
    for r2e in (6, 7, 9, 10, 11):
        cases.append(dict(kind="hilbert", r2e=r2e))
    for n, norm in ((32, 0), (128, 1), (256, 0), (100, 1)):
        cases.append(dict(kind="dct", n=n, norm=norm))
    for n, norm, auto in ((128, 0, 0), (200, 1, 0), (256, 0, 1),
                          (64, 1, 1)):
        cases.append(dict(kind="xcorr", n=n, norm=norm, auto=auto))
    for r2e in (7, 9, 11):
        lw = float(np.round(rng.uniform(0.0, 0.4), 3))
        cases.append(dict(kind="czt", r2e=r2e, low=lw,
                          high=float(np.round(lw + rng.uniform(0.05, 0.5),
                                              3))))
    for nx, nh, mode in ((64, 9, 0), (100, 31, 1), (128, 17, 2)):
        cases.append(dict(kind="conv", nx=nx, nh=nh, mode=mode))
    return cases


_DSP_FUZZ_CASES = _dsp_fuzz_cases()


def gen_fuzz_dsp_case(i):
    import json
    p = _DSP_FUZZ_CASES[i]
    out = {"params": np.array(json.dumps(p))}
    r = np.random.default_rng(4000 + i)
    kind = p["kind"]
    if kind == "hilbert":
        n = 1 << p["r2e"]
        x = r.standard_normal(n).astype(np.float32)
        lib = ctypes.cdll.LoadLibrary(REF_LIB)
        ho = ctypes.c_void_p()
        lib["hilbertObj_new"](ctypes.byref(ho), ctypes.c_int(p["r2e"]))
        hr = np.zeros(n, np.float32)
        hi = np.zeros(n, np.float32)
        lib["hilbertObj_hilbert"](ho, _f32p(x), _f32p(hr), _f32p(hi))
        out.update(x=x, re=hr, im=hi)
    elif kind == "dct":
        x = r.standard_normal(p["n"]).astype(np.float32)
        lib = ctypes.cdll.LoadLibrary(REF_LIB)
        do = ctypes.c_void_p()
        lib["dctObj_new"](ctypes.byref(do), ctypes.c_int(p["n"]), None)
        y = np.zeros(p["n"], np.float32)
        lib["dctObj_dct"](do, _f32p(x), ctypes.c_int(p["norm"]), _f32p(y))
        out.update(x=x, y=y)
    elif kind == "xcorr":
        af = _setup_reference()
        x = r.standard_normal(p["n"]).astype(np.float32)
        y = None if p["auto"] else r.standard_normal(p["n"]).astype(
            np.float32)
        arr, _val = af.Xcorr().xcorr(
            x, y, af.type.XcorrNormalType(p["norm"]))
        out.update(x=x, arr=np.asarray(arr, np.float32))
        if y is not None:
            out["y"] = y
    elif kind == "czt":
        # float64 direct zoom-DFT definition (no C oracle, see above)
        n = 1 << p["r2e"]
        x = r.standard_normal(n).astype(np.float32)
        k = np.arange(n, dtype=np.float64)
        w = p["low"] + (p["high"] - p["low"]) * k / n
        E = np.exp(-2j * np.pi * np.outer(w, k))
        y = E @ x.astype(np.float64)
        out.update(x=x, re=y.real.astype(np.float32),
                   im=y.imag.astype(np.float32))
    elif kind == "conv":
        x = r.standard_normal(p["nx"]).astype(np.float32)
        h = r.standard_normal(p["nh"]).astype(np.float32)
        full = np.convolve(x.astype(np.float64), h.astype(np.float64))
        out.update(x=x, h=h, y=full.astype(np.float32))
    save(f"_fuzzdsp{i}", **out)


def gen_fuzz_dsp():
    _gen_fuzz_group("_fuzzdsp", len(_DSP_FUZZ_CASES), "fuzz_dsp")


# Deep/DeepChroma parameter sweep: the fixed `deep` golden pins num=84 /
# r2e=12 / sr=32000 (orders 1-4).  These walk num x radix2_exp x samplate
# x deep_order (num kept <= 96: the DEEP log-scale runs C1..16 kHz, ~107
# bins max before bands leave the spectrum).

_DEEP_FUZZ_CASES = [
    dict(kind="deep", num=48, r2e=11, sr=32000, order=1),
    dict(kind="deep", num=84, r2e=11, sr=44100, order=2),
    dict(kind="deep", num=96, r2e=12, sr=32000, order=3),
    dict(kind="deep", num=60, r2e=12, sr=44100, order=4),
    dict(kind="deep", num=84, r2e=10, sr=32000, order=1),
    dict(kind="deepchroma", r2e=11, sr=32000),
    dict(kind="deepchroma", r2e=12, sr=44100),
]


def gen_fuzz_deep_case(i):
    import json
    af = _setup_reference()
    p = _DEEP_FUZZ_CASES[i]
    x = signals()["chord"]
    out = {"params": np.array(json.dumps(p))}
    if p["kind"] == "deep":
        from audioflux.spectrogram import Deep as _Deep
        dp = _Deep(num=p["num"], samplate=p["sr"], radix2_exp=p["r2e"])
        if p["order"] != 1:
            dp.set_deep_order(p["order"])
        out["arr"] = dp.spectrogram(x)
    else:
        from audioflux.spectrogram import DeepChroma as _DeepChroma
        dc = _DeepChroma(samplate=p["sr"], radix2_exp=p["r2e"])
        out["arr"] = dc.spectrogram(x)
    save(f"_fuzzdeep{i}", **out)


def gen_fuzz_deep():
    _gen_fuzz_group("_fuzzdeep", len(_DEEP_FUZZ_CASES), "fuzz_deep")


# ---------------------------------------------------------------------------
# Real-recording goldens (SURVEY §4): run the reference on the bundled sample
# WAVs at /root/reference/python/audioflux/utils/sample_data (present on every
# build machine; the audio itself is NOT committed — only derived fixtures).
# One subprocess per file: the reference corrupts its allocator across calls.

_SAMPLE_DIR = os.path.join("/root/reference/python/audioflux/utils",
                           "sample_data")
_REAL_FILES = ["voice", "220", "880", "guitar_chord1", "guitar_chord2",
               "chord_metronome1", "chord_metronome2"]
_REAL_PITCH = {"voice", "guitar_chord1", "guitar_chord2"}
_REAL_HPSS = {"chord_metronome1", "chord_metronome2"}


def _read_wav_f32(path):
    """Mono float32 from 16/32-bit PCM WAV — same int->float convention as
    audioflux_tpu.io.wave (int16/32768, int32/2^31), soundfile-compatible."""
    import wave as _wave
    w = _wave.open(path, "rb")
    try:
        assert w.getnchannels() == 1, f"{path}: expected mono"
        sw, n = w.getsampwidth(), w.getnframes()
        raw = w.readframes(n)
        sr = w.getframerate()
    finally:
        w.close()
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported width {sw}")
    return x, sr


def gen_real_case(i):
    af = _setup_reference()
    name = _REAL_FILES[i]
    x, sr = _read_wav_f32(os.path.join(_SAMPLE_DIR, f"{name}.wav"))
    assert sr == 32000
    out = {"n_samples": np.int64(len(x))}

    # mel spectrogram + FLUX onset (BFT path, like gen_mir)
    bft = af.BFT(num=128, radix2_exp=11, samplate=sr, slide_length=512,
                 scale_type=af.type.SpectralFilterBankScaleType.MEL,
                 data_type=af.type.SpectralDataType.POWER)
    spec = np.abs(bft.bft(x, result_type=1))
    out["mel"] = spec.astype(np.float32)
    on = af.Onset(time_length=spec.shape[-1], fre_length=128,
                  slide_length=512, samplate=sr,
                  novelty_type=af.type.NoveltyType.FLUX)
    point_arr, evn_arr, time_arr, value_arr = on.onset(spec)
    out["onset_points"] = np.asarray(point_arr, np.int64)
    out["onset_env"] = np.asarray(evn_arr, np.float32)

    # CQT (class-level) + chroma fold
    cq = af.CQT(num=84, samplate=sr)
    C = cq.cqt(x)
    out["cqt_re"] = np.real(C).astype(np.float32)
    out["cqt_im"] = np.imag(C).astype(np.float32)
    out["cqt_chroma"] = np.asarray(cq.chroma(C), np.float32)

    if name in _REAL_PITCH:
        yin = af.PitchYIN(samplate=sr, radix2_exp=12, slide_length=1024)
        fre, v1, v2 = yin.pitch(x)
        out["yin_fre"], out["yin_v1"] = fre, v1
        ffp = af.PitchFFP(samplate=sr, radix2_exp=12, slide_length=1024)
        ffre, fdb = ffp.pitch(x)
        out["ffp_fre"], out["ffp_db"] = ffre, fdb
        # TuneTrack via raw ctypes (no wrapper class in the reference pkg)
        lib = ctypes.cdll.LoadLibrary(REF_LIB)
        FP = ctypes.POINTER(ctypes.c_float)
        obj = ctypes.c_void_p()
        lib.tuneTrackObj_new(
            ctypes.byref(obj), ctypes.byref(ctypes.c_int(sr)), None, None,
            ctypes.byref(ctypes.c_int(12)), ctypes.byref(ctypes.c_int(1024)),
            None)
        T = lib.tuneTrackObj_calTimeLength(obj, ctypes.c_int(len(x)))
        fre_c = np.zeros(T + 8, np.float32)
        lib.tuneTrackObj_tune(obj, x.ctypes.data_as(FP),
                              ctypes.c_int(len(x)), fre_c.ctypes.data_as(FP))
        out["tune_fre"] = fre_c[:T]

    if name in _REAL_HPSS:
        hp = af.HPSS(radix2_exp=11, window_type=af.type.WindowType.HAMM,
                     slide_length=512, h_order=21, p_order=31)
        h, p = hp.hpss(x)
        out["hpss_h"] = np.asarray(h, np.float32)
        out["hpss_p"] = np.asarray(p, np.float32)

    if name == "voice":
        # spectral-feature stack on a real voice recording
        mel = af.MelSpectrogram(num=128, samplate=sr, radix2_exp=11,
                                slide_length=512)
        spec = mel.spectrogram(x)
        fre = mel.get_fre_band_arr()
        sp = af.Spectral(num=128, fre_band_arr=fre)
        sp.set_time_length(spec.shape[-1])
        out["sp_spec"] = np.asarray(spec, np.float32)
        for meth in ("flatness", "flux", "centroid", "spread", "rolloff",
                     "rms", "entropy", "slope"):
            out[f"sp_{meth}"] = np.asarray(getattr(sp, meth)(spec),
                                           np.float32)

    if name == "guitar_chord1":
        # wavelet stack: CWT (morlet, octave) + synchrosqueeze on a real
        # plucked-string second (exactly 2**14 samples)
        seg = x[:1 << 14]
        cwt = af.CWT(num=28, radix2_exp=14, samplate=sr,
                     wavelet_type=af.type.WaveletContinueType.MORLET,
                     scale_type=af.type.SpectralFilterBankScaleType.OCTAVE)
        W = cwt.cwt(seg)
        out["cwt_re"] = np.real(W).astype(np.float32)
        out["cwt_im"] = np.imag(W).astype(np.float32)
        sq = af.Synsq(num=28, radix2_exp=14, samplate=sr)
        Sq = sq.synsq(W, af.type.SpectralFilterBankScaleType.OCTAVE,
                      cwt.get_fre_band_arr())
        out["synsq_re"] = np.real(Sq).astype(np.float32)
        out["synsq_im"] = np.imag(Sq).astype(np.float32)

    if name == "220":
        cep = af.Cepstrogram(radix2_exp=12, samplate=sr, slide_length=1024)
        c1, c2, c3 = cep.cepstrogram(x)
        out["cep_coef"] = np.asarray(c1, np.float32)
        out["cep_env"] = np.asarray(c2, np.float32)
        out["cep_tone"] = np.asarray(c3, np.float32)

    save(f"real_{name}", **out)


def gen_real():
    import subprocess
    for i, name in enumerate(_REAL_FILES):
        path = os.path.join(GOLDEN_DIR, f"real_{name}.npz")
        if os.path.exists(path):
            os.remove(path)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        f"_realcase{i}"])
        if not os.path.exists(path):
            raise RuntimeError(f"real case {name} failed")


GROUPS = {
    "windows": lambda af: gen_windows(),
    "filterbanks": lambda af: gen_filterbanks(),
    "spectrogram": gen_spectrogram,
    "chroma": gen_chroma,
    "stft": gen_stft,
    "spectral": gen_spectral,
    "features": gen_features,
    "bft": gen_bft,
    "cqt": gen_cqt,
    "cwt": gen_cwt,
    "pwt": gen_pwt,
    "synsq": gen_synsq,
    "st": gen_st,
    "dwt": gen_dwt,
    "nsgt": gen_nsgt,
    "mir": gen_mir,
    "pitch": gen_pitch,
    "mir2": gen_mir2,
    "deep": gen_deep,
    "vqt": gen_vqt,
    "fuzz_bft": lambda af: gen_fuzz_bft(),
    "fuzz_cqt": lambda af: gen_fuzz_cqt(),
    "fuzz_nsgt": lambda af: gen_fuzz_nsgt(),
    "fuzz_dwt": lambda af: gen_fuzz_dwt(),
    "fuzz_wpt": lambda af: gen_fuzz_wptswt(),
    "fuzz_wavelet": lambda af: gen_fuzz_wavelet(),
    "fuzz_edges": gen_fuzz_edges,
    "fuzz_reassign": gen_fuzz_reassign,
    "fuzz_pitch": lambda af: gen_fuzz_pitch(),
    "fuzz_onset": gen_fuzz_onset,
    "fuzz_harmonic": gen_fuzz_harmonic,
    "fuzz_chroma": lambda af: gen_fuzz_chroma(),
    "fuzz_core": lambda af: gen_fuzz_core(),
    "fuzz_extractor": gen_fuzz_extractor,
    "fuzz_resample": lambda af: gen_fuzz_resample(),
    "fuzz_utils": gen_fuzz_utils,
    "fuzz_features": lambda af: gen_fuzz_features(),
    "fuzz_spectral": lambda af: gen_fuzz_spectral(),
    "classic": lambda af: gen_classic(),
    "dsp": gen_dsp,
    "harmonic": gen_harmonic,
    "pitch_ffp": gen_pitch_ffp,
    "pitch_stft": gen_pitch_stft,
    "fuzz_mir2": lambda af: gen_fuzz_mir2(),
    "fuzz_stft": lambda af: gen_fuzz_stft(),
    "fuzz_dsp": lambda af: gen_fuzz_dsp(),
    "fuzz_deep": lambda af: gen_fuzz_deep(),
    "real": lambda af: gen_real(),
}


def main():
    groups = sys.argv[1:] or ["all"]
    if "all" in groups:
        groups = list(GROUPS)
    if len(groups) == 1 and groups[0].startswith("_fbcase"):
        gen_filterbank_case(int(groups[0][7:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzbft"):
        gen_fuzz_bft_case(int(groups[0][8:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzcqt"):
        gen_fuzz_cqt_case(int(groups[0][8:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzznsgt"):
        gen_fuzz_nsgt_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzdwt"):
        gen_fuzz_dwt_case(int(groups[0][8:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzwpt"):
        gen_fuzz_wptswt_case(int(groups[0][8:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzwave"):
        gen_fuzz_wavelet_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzpitch"):
        gen_fuzz_pitch_case(int(groups[0][10:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzchroma"):
        gen_fuzz_chroma_case(int(groups[0][11:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzcore"):
        gen_fuzz_core_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzresample"):
        gen_fuzz_resample_case(int(groups[0][13:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzfeat"):
        gen_fuzz_features_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzmir2"):
        gen_fuzz_mir2_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzspectral"):
        gen_fuzz_spectral_case(int(groups[0][13:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzstft"):
        gen_fuzz_stft_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzdsp"):
        gen_fuzz_dsp_case(int(groups[0][8:]))
        return
    if len(groups) == 1 and groups[0].startswith("_fuzzdeep"):
        gen_fuzz_deep_case(int(groups[0][9:]))
        return
    if len(groups) == 1 and groups[0].startswith("_realcase"):
        gen_real_case(int(groups[0][9:]))
        return
    if len(groups) > 1:
        # Run each group in its own subprocess: the reference C library has
        # latent heap overflows (e.g. Nyquist-edge filterbank rows) that can
        # corrupt the allocator across successive calls in one process.
        import subprocess
        for g in groups:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), g])
            if r.returncode != 0:
                print(f"group {g} FAILED (rc={r.returncode})")
        return
    af = _setup_reference()
    for g in groups:
        GROUPS[g](af)


if __name__ == "__main__":
    main()
