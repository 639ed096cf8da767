"""CQT/VQT + postprocessing parity vs reference C goldens, and resampler
parity (the CQT multirate chain exercises it at every octave)."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.dsp.resample import Resample
from audioflux_tpu.transforms.cqt import CQT, SimpleCQT, VQT
from audioflux_tpu.types import ResampleQualityType


@pytest.fixture(scope="module")
def cqt_pair(goldens, signals):
    g = goldens("cqt")
    obj = CQT(num=84, samplate=32000)
    C = np.asarray(obj.cqt(signals["chord"]))
    return obj, C, g


def test_cqt(cqt_pair):
    obj, C, g = cqt_pair
    ref = g["cqt_re"] + 1j * g["cqt_im"]
    assert obj.fft_length == g["cqt_fft_length"][0]
    np.testing.assert_allclose(obj.get_fre_band_arr(), g["cqt_fre"], atol=1e-3)
    assert_close_to_golden(C.real, ref.real, 5e-5, "cqt_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "cqt_im")


def test_cqt_chroma(cqt_pair):
    obj, C, g = cqt_pair
    out = np.asarray(obj.chroma(C))
    assert_close_to_golden(out, g["cqt_chroma"], 2e-4, "cqt_chroma")


def test_cqcc(cqt_pair):
    # feed the golden CQT: log10 on noise-floor bins would otherwise amplify
    # the 5e-6-level cqt differences into the cepstral comparison
    obj, _, g = cqt_pair
    ref_C = np.abs(g["cqt_re"] + 1j * g["cqt_im"])
    out = np.asarray(obj.cqcc(ref_C, cc_num=13))
    np.testing.assert_allclose(out, g["cqt_cqcc"], atol=2e-3)


def test_cqhc(cqt_pair):
    obj, C, g = cqt_pair
    out = np.asarray(obj.cqhc(np.abs(C) ** 2, hc_num=13))
    assert_close_to_golden(out, g["cqt_cqhc"], 2e-4, "cqt_cqhc")


def test_cqt_deconv(cqt_pair):
    obj, C, g = cqt_pair
    t, p = obj.deconv(np.abs(C))
    assert_close_to_golden(t, g["cqt_dec_t"], 2e-4, "cqt_dec_t")
    assert_close_to_golden(p, g["cqt_dec_p"], 2e-3, "cqt_dec_p")


def test_vqt(goldens, signals):
    g = goldens("vqt")
    obj = VQT(num=84, samplate=32000, beta=0.5)
    C = np.asarray(obj.cqt(signals["chord"]))
    ref = g["vqt_re"] + 1j * g["vqt_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "vqt_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "vqt_im")


def test_cqt_batched(signals):
    obj = CQT(num=84, samplate=32000)
    x = signals["chord"][:16000]
    out = np.asarray(obj.cqt(np.stack([x, 0.3 * x])))
    single = np.asarray(obj.cqt(x))
    assert out.shape[0] == 2
    np.testing.assert_allclose(out[0], single, rtol=1e-5, atol=1e-7)


def test_simple_cqt(signals):
    obj = SimpleCQT(num=84, samplate=32000)
    C = np.asarray(obj.cqt(signals["chord"][:16000]))
    assert C.shape[0] == 84 and np.isfinite(C).all()


def test_resample_ratio_2_3(signals):
    """General rational ratio p/q with a non-trivial phase pattern."""
    x = signals["sine"][:9000]
    rs = Resample(ResampleQualityType.MID)
    rs.set_samplate(48000, 32000)  # p=2, q=3
    y = np.asarray(rs.resample(x))
    assert y.shape[-1] == 6000
    # downsampling a 440 Hz tone keeps the tone: compare spectra peak
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f_peak = np.argmax(spec) * (32000 / 3 * 2) / len(y)
    assert abs(f_peak - 440) < 10


def test_resample_banded_matmul_matches_conv(signals):
    """The TPU banded-matmul FIR path (dsp/resample.py _banded_fir)
    computes the same products as the strided conv path — forced on here
    (CPU) and compared against the conv form for 2:1 and 2:3 ratios."""
    from audioflux_tpu.dsp.resample import _poly_resample
    import jax.numpy as jnp
    x = np.stack([signals["chirp"][:9000], signals["sine"][:9000]])
    for src, dst in ((2, 1), (48000, 32000)):
        rs = Resample(ResampleQualityType.BEST)
        rs.set_samplate(src, dst)
        plan = rs._plan()
        out_len = int(np.floor(x.shape[-1] * rs.ratio))
        kw = dict(p=plan.p, q=plan.q, out_len=out_len, max_l=plan.max_l,
                  bases=tuple(plan.base))
        conv = np.asarray(_poly_resample(
            jnp.asarray(x), jnp.asarray(plan.filts), **kw))
        band = np.asarray(_poly_resample(
            jnp.asarray(x), jnp.asarray(plan.filts), force_matmul=True, **kw))
        np.testing.assert_allclose(band, conv, atol=2e-6, rtol=2e-6)


def test_resample_streaming_continue(signals):
    """is_continue: per-chunk q-multiple truncation (C-exact lengths) and
    the tail_carry=True corrected mode (seamless, matches whole-shot)."""
    x = np.asarray(signals["chirp"][:30000], np.float32)
    chunks = [x[:7000], x[7000:15500], x[15500:]]

    rs = Resample(is_continue=True)
    rs.set_samplate(32000, 22050)  # p=441, q=640
    lens = [np.asarray(rs.resample(c)).shape[-1] for c in chunks]
    # C drops each chunk's remainder: (n - n%640)*441//640
    assert lens == [(len(c) - len(c) % 640) * 441 // 640 for c in chunks]
    assert rs.cal_data_length(7000) == lens[0]

    rc = Resample(is_continue=True, tail_carry=True)
    rc.set_samplate(32000, 22050)
    parts = [np.asarray(rc.resample(c)) for c in chunks]
    y = np.concatenate(parts)
    # unflushed trailing remainder stays in the carried tail
    carried = len(x) - len(rc._tail)
    assert carried % 640 == 0 and len(y) == carried * 441 // 640
    rw = Resample()
    rw.set_samplate(32000, 22050)
    yw = np.asarray(rw.resample(x))[:len(y)]
    # interiors identical; only the chunk-boundary filter context differs
    mism = np.abs(y - yw) > 1e-4
    assert mism.mean() < 0.02


def test_resample_large_ratio_plan_taps_below_stride():
    """Regression (r4): polyphase plans whose per-phase kernels are
    SHORTER than the stride (pitch_shift's 890/999: taps 36, q 999) made
    the banded form's next-row borrow E = taps - q negative and crashed
    the einsum.  Such plans must fall back to the strided conv even when
    the matmul path is forced/gated on."""
    from audioflux_tpu.dsp.resample import _poly_resample, Resample
    from audioflux_tpu.types import ResampleQualityType
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 40000)).astype(np.float32)
    rs = Resample(ResampleQualityType.FAST, is_scale=True)
    rs.p, rs.q = 890, 999
    rs.ratio = 890 / 999
    plan = rs._plan()
    assert plan.filts.shape[-1] <= plan.q  # the broken regime
    out_len = int(np.floor(x.shape[-1] * rs.ratio))
    kw = dict(p=plan.p, q=plan.q, out_len=out_len, max_l=plan.max_l,
              bases=tuple(plan.base))
    conv = np.asarray(_poly_resample(
        jnp.asarray(x), jnp.asarray(plan.filts), **kw))
    forced = np.asarray(_poly_resample(
        jnp.asarray(x), jnp.asarray(plan.filts), force_matmul=True, **kw))
    np.testing.assert_array_equal(forced, conv)

    # end-to-end: the public PitchShift path that hit the crash
    import audioflux_tpu as af
    y = np.asarray(af.PitchShift(radix2_exp=11).pitch_shift(
        x[0][:16000], 2))
    assert y.shape[-1] > 0 and np.isfinite(y).all()
