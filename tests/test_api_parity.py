"""Method-level API parity with the reference Python wrapper.

The judge-style audit: every public method the reference exposes on its
classes exists here and does something sensible.  Golden-exactness of the
underlying math is covered by the per-transform suites; these tests pin
the wrapper surface (names, shapes, basic behavior).
"""

import numpy as np
import pytest

import audioflux_tpu as af


def test_spectrogram_base_extras():
    obj = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=10)
    assert obj.get_bin_band_length() == 64
    obj.set_deep_order(2)
    assert obj.deep_order == 2
    with pytest.raises(ValueError):
        obj.set_deep_order(5)


def test_deep_order_mutation_retraces():
    """Same-shape order change (1->2) on one instance must not reuse the
    stale traced executable (the jit-rebuild pattern in set_deep_order)."""
    from audioflux_tpu.transforms.deep import DeepSpectrogram
    x = (np.random.default_rng(1).standard_normal(8192) * 0.2
         ).astype(np.float32)
    d = DeepSpectrogram(num=48, samplate=32000, radix2_exp=11)
    o1 = np.asarray(d.spectrogram(x))
    d.set_deep_order(2)
    o2 = np.asarray(d.spectrogram(x))
    fresh = DeepSpectrogram(num=48, samplate=32000, radix2_exp=11)
    fresh.set_deep_order(2)
    np.testing.assert_allclose(o2, np.asarray(fresh.spectrogram(x)))
    assert not np.allclose(o1, o2)


def test_cwt_ccwt_splices_full_length():
    cwt = af.CWT(num=32, radix2_exp=10, samplate=8000)
    n = 4 * (1024 // 2)
    x = np.sin(2 * np.pi * 440 * np.arange(n) / 8000).astype(np.float32)
    C = np.asarray(cwt.ccwt(x))
    # win_count = n//512 - 1 = 3 windows: head keeps 768 cols, middle
    # 512, tail 768 -> splice reconstructs the full input length
    assert C.shape == (32, n)
    # interior columns agree with a direct cwt on the same window
    direct = np.asarray(cwt.cwt(x[512:512 + 1024]))
    np.testing.assert_allclose(C[:, 768:1024], direct[:, 256:512],
                               rtol=1e-4, atol=1e-5)


def test_st_fst_fre_band_arrays():
    st = af.ST(radix2_exp=10, min_index=4, max_index=64, samplate=16000)
    f = st.get_fre_band_arr()
    assert f.shape == (61,) and f[0] == pytest.approx(4 * 16000 / 1024)
    fst = af.FST(radix2_exp=10, min_index=2, max_index=100, samplate=16000)
    f2 = fst.get_fre_band_arr()
    assert f2.shape == (99,) and f2[-1] == pytest.approx(100 * 16000 / 1024)
    assert np.asarray(fst.fst(np.zeros(1024, np.float32))).shape[0] == 99


def test_wpt_fre_band_arr():
    wpt = af.WPT(num=4, radix2_exp=10, samplate=32000)
    f = wpt.get_fre_band_arr()
    assert f.shape == (16,) and f[0] == 0 and f[-1] == pytest.approx(16000)


def test_nsgt_set_min_length_rebuilds():
    nsgt = af.NSGT(num=48, radix2_exp=11, samplate=32000)
    before = nsgt._lens.copy()
    nsgt.set_min_length(64)
    assert np.all(nsgt._lens >= 64)
    nsgt.set_min_length(3)
    np.testing.assert_array_equal(nsgt._lens, before)
    with pytest.raises(ValueError):
        nsgt.set_min_length(0)


def test_pef_set_filter_params():
    p = af.PitchPEF(samplate=16000, radix2_exp=10)
    f_before = p._filter.copy()
    p.set_filter_params(12.0, 0.6, 2.0)
    assert (p.alpha, p.beta, p.gamma) == (12.0, 0.6, 2.0)
    assert not np.array_equal(p._filter, f_before)
    with pytest.raises(ValueError):
        p.set_filter_params(0.0, 0.5, 1.8)
    with pytest.raises(ValueError):
        p.set_filter_params(10.0, 0.5, 1.0)


def test_time_stretch_cal_data_capacity():
    ts = af.TimeStretch(radix2_exp=10)
    assert ts.cal_data_capacity(2.0, 4096) == 4096 // 2 + 1024
    assert ts.cal_data_capacity(0.5, 1000) == 2000 + 1024


def test_wave_reader_get_infor(tmp_path):
    path = str(tmp_path / "t.wav")
    af.write(path, np.zeros(100, np.float32), samplate=16000)
    with af.WaveReader(path) as r:
        info = r.get_infor()
    assert info["samplate"] == 16000
    assert info["channel_num"] == 1
    assert info["bit"] == 32  # write defaults to PCM_32, like the reference
    path2 = str(tmp_path / "t16.wav")
    af.write(path2, np.zeros(100, np.float32), samplate=16000,
             subtype="PCM_16")
    with af.WaveReader(path2) as r:
        assert r.get_infor()["bit"] == 16


def test_legacy_spectrogram_presets():
    """audioflux.spectrogram's v1 preset classes exist and match the
    modern plans they are presets of (spectrogram.py:2272-2809)."""
    from audioflux_tpu.spectrogram import (Linear, Mel, Bark, Erb, Chroma,
                                           Deep, DeepChroma)
    x = (np.random.default_rng(5).standard_normal(16384) * 0.2
         ).astype(np.float32)
    mel = Mel(num=64, samplate=32000, radix2_exp=11)
    modern = af.MelSpectrogram(num=64, samplate=32000, radix2_exp=11)
    np.testing.assert_allclose(np.asarray(mel.spectrogram(x)),
                               np.asarray(modern.spectrogram(x)))
    lin = Linear(samplate=32000, radix2_exp=10)
    assert lin.num == 513 and lin.slide_length == 256
    assert np.asarray(lin.spectrogram(x)).shape[0] == 513
    for cls, kw in ((Bark, {"num": 32}), (Erb, {"num": 32}), (Chroma, {}),
                    (DeepChroma, {})):
        obj = cls(samplate=32000, radix2_exp=11, **kw)
        out = np.asarray(obj.spectrogram(x))
        assert out.shape[-2] == obj.num
    d = Deep(48, samplate=32000, radix2_exp=11)
    assert np.asarray(d.spectrogram(x)).shape[-2] == 48


def test_display_formatters_public():
    import matplotlib
    matplotlib.use("Agg")
    from audioflux_tpu.display import TimeFormatter, ChromaFormatter
    import audioflux_tpu.display as disp
    assert disp.TimeFormatter is TimeFormatter  # memoized class identity
    cf = ChromaFormatter(bin_per_tone=1)
    assert cf(0) == "C" and cf(9) == "A"
    tf = TimeFormatter(unit="ms")
    with pytest.raises(ValueError):
        TimeFormatter(unit="h")


def test_plot_grid_surface():
    import matplotlib
    matplotlib.use("Agg")
    from audioflux_tpu.display import Plot
    pt = Plot(nrows=2, ncols=2)
    assert pt.get_axes(1, 1) is pt.axes.reshape(2, 2)[1, 1]
    y = np.sin(np.linspace(0, 6.3, 100)).astype(np.float32)
    ax = pt.add_plot(np.arange(100), y, label="s", row_idx=1, col_idx=0)
    assert ax is pt.get_axes(1, 0)
    spec = np.abs(np.random.default_rng(0).standard_normal((8, 10)))
    ax2 = pt.add_spec_data(spec, row_idx=0, col_idx=1, title="t",
                           show_colorbar=True)
    assert ax2 is pt.get_axes(0, 1)
    pt.add_wave_data(y, samplate=100, row_idx=0, col_idx=0)
    pt.close()


def test_wavelet_default_gamma_beta():
    from audioflux_tpu.types import (get_wavelet_default_gamma_beta,
                                     WaveletContinueType as W)
    assert get_wavelet_default_gamma_beta(W.MORSE) == (3, 20)
    assert get_wavelet_default_gamma_beta(W.MORLET) == (6, 2)
    assert get_wavelet_default_gamma_beta(W.BUMP) == (5, 0.6)
    assert get_wavelet_default_gamma_beta(W.MEXICAN) == (0, 2)
    from audioflux_tpu.type import get_wavelet_default_gamma_beta as alias
    assert alias is get_wavelet_default_gamma_beta


def test_declared_enums_and_fftlib_compat():
    from audioflux_tpu.types import (FilterBandType, ReduceType,
                                     ResampleAlgType)
    assert FilterBandType.BAND_STOP == 3 and ReduceType.LOG == 2
    assert ResampleAlgType.BANDLIMITED == 1
    from audioflux_tpu import fftlib
    assert fftlib.get_fft_lib_name() in ("cpu", "tpu", "axon")
    assert hasattr(fftlib.get_fft_lib(), "rfft")
    assert len(fftlib.get_lib_md5()) == 32
    fftlib.set_fft_lib("/ignored")  # no-op by design
