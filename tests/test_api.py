"""Package-level API surface: imports, one-shot functions, extractor facade,
weighting, synthesis, display (Agg)."""

import os

import numpy as np
import pytest

import audioflux_tpu as af


def test_one_shot_api(signals):
    x = signals["chord"][:8192]
    m = np.asarray(af.mel_spectrogram(x, num=64, radix2_exp=10)[0])
    assert m.shape[0] == 64
    cc = np.asarray(af.mfcc(x, mel_num=64, radix2_exp=10)[0])
    assert cc.shape[0] == 13
    c = np.asarray(af.chroma_linear(x, radix2_exp=10))
    assert c.shape[0] == 12
    q = np.asarray(af.cqt(x[:4096], num=48, samplate=32000)[0])
    assert q.shape[0] == 48


def test_one_shot_plan_caching(signals):
    """Identical one-shot calls must reuse one plan object (and therefore
    one compiled executable); distinct parameters must not collide."""
    from audioflux_tpu.core import _plan
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram

    a = _plan(MelSpectrogram, num=32, radix2_exp=10, samplate=32000)
    b = _plan(MelSpectrogram, num=32, radix2_exp=10, samplate=32000)
    c = _plan(MelSpectrogram, num=48, radix2_exp=10, samplate=32000)
    assert a is b and a is not c

    x = signals["chord"][:4096]
    m1 = np.asarray(af.chroma_linear(x, radix2_exp=10))
    m2 = np.asarray(af.chroma_linear(x, radix2_exp=10))
    np.testing.assert_array_equal(m1, m2)
    # chroma norm is part of the cache key, not a mutation of a shared plan
    m3 = np.asarray(af.chroma_linear(
        x, radix2_exp=10, norm_type=af.ChromaDataNormalType.NONE))
    assert not np.array_equal(m1, m3)


def test_cqt_jit_reuse(signals):
    """CQT runs under one per-instance jit; set_scale only swaps the
    traced scale-vector operand, so the same executable serves both."""
    x = signals["chord"][:4096].astype(np.float32)
    obj = af.CQT(num=48, samplate=32000, slide_length=1024)
    q1 = np.asarray(obj.cqt(x))
    fn1 = obj._cqt_run
    q2 = np.asarray(obj.cqt(x))
    assert obj._cqt_run is fn1
    np.testing.assert_array_equal(q1, q2)
    obj.set_scale(False)
    q3 = np.asarray(obj.cqt(x))
    assert not np.array_equal(q1, q3)
    # unscaled output differs exactly by the per-bin sqrt(len) factor
    obj.set_scale(True)
    np.testing.assert_array_equal(np.asarray(obj.cqt(x)), q1)


def test_feature_extractor(signals):
    x = signals["chord"][:4096]
    fe = af.FeatureExtractor(
        transforms=["bft", "cwt", "cqt"], samplate=32000, radix2_exp=10,
        scale_type=af.SpectralFilterBankScaleType.OCTAVE)
    res = fe.spectrogram(x)
    assert set(res) == {"bft", "cwt", "cqt"}
    sp = fe.spectral(res, "centroid")
    assert all("centroid" in v for v in sp.values())
    xcc = fe.xxcc(res, cc_num=13)
    assert all(np.asarray(v["xxcc"]).shape[-2] == 13 for v in xcc.values())
    dc = fe.deconv(res)
    assert all("timbre" in v and "pitch" in v for v in dc.values())


def test_weighting_matches_reference():
    # values computed from the reference C auditory_weight{A,B,C,D}
    f = np.array([100.0, 1000.0, 10000.0])
    np.testing.assert_allclose(af.utils.weight_a(f),
                               [-19.144939, 2.07e-4, -2.4881248], atol=1e-3)
    np.testing.assert_allclose(af.utils.weight_b(f),
                               [-5.64738, 3.51e-4, -4.2985554], atol=1e-3)
    np.testing.assert_allclose(af.utils.weight_c(f),
                               [-0.29956, 1.07e-4, -4.4054685], atol=1e-3)
    np.testing.assert_allclose(af.utils.weight_d(f),
                               [2.5558186, 8.721247, 3.0816364], atol=1e-3)


def test_synth_f0_pitch():
    y = af.utils.synth_f0([0.0, 1.0], [440.0, 440.0], 32000)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = np.argmax(spec) * 32000 / len(y)
    assert abs(peak - 440) < 2


def test_display_smoke(tmp_path, signals):
    import matplotlib
    matplotlib.use("Agg")
    from audioflux_tpu.display import Plot, fill_spec
    x = signals["chord"][:4096]
    m = np.asarray(af.mel_spectrogram(x, num=32, radix2_exp=9)[0])
    p = Plot(nrows=2)
    p.add_spec_data(m, title="mel")
    p.add_wave_data(x)
    out = tmp_path / "p.png"
    p.save(str(out))
    assert out.exists() and out.stat().st_size > 0


def test_bench_matrix_floor_gate():
    """A de-routed (regressed) row or a missing floored row must trip the
    matrix perf gate (VERDICT r4 item 5); healthy rows must pass."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..",
                                  "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    import sys as _sys
    argv = _sys.argv
    _sys.argv = ["bench.py"]  # module-level sys.argv peeks
    try:
        spec.loader.exec_module(bench)
    finally:
        _sys.argv = argv
    healthy = [{"metric": m, "value": f * 1.25}
               for m, f in bench.MATRIX_FLOORS.items()]
    assert bench._check_matrix_floors(healthy)
    regressed = [dict(r) for r in healthy]
    regressed[0]["value"] = bench.MATRIX_FLOORS[regressed[0]["metric"]] * 0.5
    assert not bench._check_matrix_floors(regressed)
    assert not bench._check_matrix_floors(healthy[:-1])  # missing row
