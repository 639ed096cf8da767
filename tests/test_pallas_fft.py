"""Four-step matmul FFT kernel (ops/pallas_fft.py), interpret mode.

The kernel is TPU-gated in production (CPU keeps jnp.fft so goldens are
untouched); these tests run it in Pallas interpret mode against numpy and
drive the two gated consumers (YIN autocorrelation, HPSS) down their
kernel paths via the static ``use_kernel``/``use_fft_kernel`` args
(monkeypatching the gate would NOT retrace the module-level jits —
CLAUDE.md's r3 gate-writing lesson).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioflux_tpu.ops import pallas_fft as pf

TOL = 5e-5  # bf16x3 contract, relative to the spectrum peak


@pytest.mark.parametrize("n", [2048, 4096, 8192])
def test_cfft_fwd_vs_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)).astype(np.float32)
    y = rng.standard_normal((3, n)).astype(np.float32)
    ref = np.fft.fft(x.astype(np.float64) + 1j * y.astype(np.float64))
    yr, yi = pf.fft4_fwd(jnp.asarray(x), jnp.asarray(y), interpret=True)
    got = (np.asarray(pf.t_to_natural(yr))
           + 1j * np.asarray(pf.t_to_natural(yi)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < TOL


@pytest.mark.parametrize("n", [2048, 4096])
def test_rfft_real_input(n):
    rng = np.random.default_rng(n + 1)
    x = rng.standard_normal((2, 3, n)).astype(np.float32)
    ref = np.fft.fft(x.astype(np.float64))
    yr, yi = pf.fft4_fwd(jnp.asarray(x), interpret=True)
    got = (np.asarray(pf.t_to_natural(yr))
           + 1j * np.asarray(pf.t_to_natural(yi)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < TOL


def test_inverse_roundtrip():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 2048)).astype(np.float32)
    y = rng.standard_normal((5, 2048)).astype(np.float32)
    yr, yi = pf.fft4_fwd(jnp.asarray(x), jnp.asarray(y), interpret=True)
    xr, xi = pf.fft4_inv(yr, yi, interpret=True)
    assert np.max(np.abs(np.asarray(xr) - x)) < 2e-4
    assert np.max(np.abs(np.asarray(xi) - y)) < 2e-4


def test_inverse_real_output_skips_imag():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((4, 2048)).astype(np.float32)
    yr, yi = pf.fft4_fwd(jnp.asarray(x), interpret=True)
    xr, xi = pf.fft4_inv(yr, yi, out_imag=False, interpret=True)
    assert xi is None
    assert np.max(np.abs(np.asarray(xr) - x)) < 2e-4


def test_odd_batch_padding():
    # batch not a multiple of the kernel tile
    rng = np.random.default_rng(9)
    x = rng.standard_normal((131, 2048)).astype(np.float32)
    ref = np.fft.fft(x.astype(np.float64))
    yr, yi = pf.fft4_fwd(jnp.asarray(x), interpret=True)
    got = (np.asarray(pf.t_to_natural(yr))
           + 1j * np.asarray(pf.t_to_natural(yi)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < TOL


def test_layout_helpers_inverse():
    rng = np.random.default_rng(10)
    z = jnp.asarray(rng.standard_normal((3, 4096)).astype(np.float32))
    z3 = pf.natural_to_t(z, 32)
    assert z3.shape == (3, 32, 128)
    assert bool(jnp.all(pf.t_to_natural(z3) == z))


def test_supports_gating():
    # CPU backend: never supported (goldens ride jnp.fft)
    assert not pf.supports(2048)
    assert not pf.supports(1024)
    assert not pf.supports(3000)


def test_yin_kernel_path_matches_rfft_path(tone=None):
    from audioflux_tpu.mir.pitch_yin import _yin_impl

    sr = 32000
    t = np.arange(sr, dtype=np.float32) / sr
    x = (0.6 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    kw = dict(fft_length=4096, slide_length=1024, auto_length=2048,
              min_index=15, max_index=1185, samplate=sr, thresh=0.1)
    f0, v0, y0, _ = _yin_impl(jnp.asarray(x), packed_fft=False, **kw)
    f1, v1, y1, _ = _yin_impl(jnp.asarray(x), packed_fft=True,
                              use_fft_kernel=True, interpret=True, **kw)
    # CMND curves agree to the kernel contract; the picked pitches agree
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-4)


def test_hpss_kernel_path_matches_reference_path():
    from audioflux_tpu.mir.hpss import _hpss_impl
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.types import WindowType

    rng = np.random.default_rng(11)
    sr = 32000
    t = np.arange(2 * sr, dtype=np.float32) / sr
    x = (0.5 * np.sin(2 * np.pi * 330 * t)
         + 0.3 * rng.standard_normal(2 * sr)).astype(np.float32)
    w = jnp.asarray(get_fft_window(WindowType.HAMM, 2048))
    kw = dict(fft_length=2048, slide_length=512, h_order=21, p_order=31)
    h0, p0 = _hpss_impl(jnp.asarray(x), w, **kw)
    h1, p1 = _hpss_impl(jnp.asarray(x), w, use_kernel=True,
                        interpret=True, **kw)
    sc = float(jnp.max(jnp.abs(h0))) + 1e-9
    assert float(jnp.max(jnp.abs(h1 - h0))) / sc < 1e-3
    sc = float(jnp.max(jnp.abs(p0))) + 1e-9
    assert float(jnp.max(jnp.abs(p1 - p0))) / sc < 1e-3


@pytest.mark.parametrize("rt", [0, 1, 2])  # ALL, FRE, TIME
@pytest.mark.parametrize("result_type", [0, 1])
def test_reassign_kernel_path_matches_native(rt, result_type):
    from audioflux_tpu.transforms.reassign import (_reassign_impl,
                                                   reassign_windows)
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.types import WindowType

    rng = np.random.default_rng(20 + rt)
    sr = 32000
    x = rng.standard_normal((2, 3 * 2048)).astype(np.float32)
    wins = jnp.asarray(np.stack(reassign_windows(
        get_fft_window(WindowType.HANN, 2048))))
    kw = dict(fft_length=2048, slide_length=512, samplate=sr,
              thresh=0.001, re_type=rt, order=1,
              result_type=result_type, is_padding=False)
    o0, s0 = _reassign_impl(jnp.asarray(x), wins, use_kernel=False, **kw)
    o1, s1 = _reassign_impl(jnp.asarray(x), wins, use_kernel=True,
                            interpret=True, **kw)
    # plain STFT output: straight kernel-vs-native fft comparison
    sc = float(jnp.max(jnp.abs(s0)))
    assert float(jnp.max(jnp.abs(s1 - s0))) / sc < 1e-4
    # reassigned scatter: grid-index knife edges can flip a cell between
    # neighboring bins (the documented cross-libm class) — bound the
    # flipped mass fraction and require total mass conservation
    a0, a1 = np.asarray(jnp.abs(o0)), np.asarray(jnp.abs(o1))
    peak = a0.max()
    flips = np.mean(np.abs(a1 - a0) > 1e-3 * peak)
    assert flips < 5e-3, flips
    np.testing.assert_allclose(a1.sum(), a0.sum(), rtol=1e-4)


def test_reassign_kernel_path_T1():
    # the bench server shape: one frame per clip
    from audioflux_tpu.transforms.reassign import (_reassign_impl,
                                                   reassign_windows)
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.types import WindowType

    rng = np.random.default_rng(31)
    x = rng.standard_normal((4, 4096)).astype(np.float32)
    wins = jnp.asarray(np.stack(reassign_windows(
        get_fft_window(WindowType.HANN, 4096))))
    kw = dict(fft_length=4096, slide_length=1024, samplate=32000,
              thresh=0.001, re_type=0, order=1, result_type=1,
              is_padding=False)
    o0, _ = _reassign_impl(jnp.asarray(x), wins, use_kernel=False, **kw)
    o1, _ = _reassign_impl(jnp.asarray(x), wins, use_kernel=True,
                           interpret=True, **kw)
    a0, a1 = np.asarray(jnp.real(o0)), np.asarray(jnp.real(o1))
    peak = np.abs(a0).max()
    assert np.mean(np.abs(a1 - a0) > 1e-3 * peak) < 5e-3
    np.testing.assert_allclose(a1.sum(), a0.sum(), rtol=1e-4)


def test_small_t_mel_kernel_path_matches_native():
    from audioflux_tpu.transforms.spectrogram import _small_t_mel_cc
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram

    plan = MelSpectrogram(num=128, samplate=32000, radix2_exp=12,
                          slide_length=1024)
    rng = np.random.default_rng(40)
    x = jnp.asarray(rng.standard_normal((6, 4096)).astype(np.float32))
    w = jnp.asarray(plan.window)
    dct = jnp.asarray(plan._dct[:13])
    fb = plan.filter_bank
    m0, c0 = _small_t_mel_cc(x, w, jnp.asarray(fb), dct,
                             fft_length=4096, slide_length=1024,
                             use_kernel=False)
    fbT = jnp.asarray(pf.permute_bins_t(fb, 4096))
    m1, c1 = _small_t_mel_cc(x, w, fbT, dct, fft_length=4096,
                             slide_length=1024, use_kernel=True,
                             interpret=True)
    sc = float(jnp.max(jnp.abs(m0)))
    assert float(jnp.max(jnp.abs(m1 - m0))) / sc < 1e-4
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-3)


def test_permute_bins_t_identity():
    # contraction over the permuted full spectrum == natural half-spectrum
    rng = np.random.default_rng(41)
    n = 2048
    m = n // 2 + 1
    fb = rng.random((5, m)).astype(np.float32)
    x = rng.standard_normal((n,)).astype(np.float32)
    X = np.fft.fft(x)
    P_nat = np.abs(X[:m]) ** 2
    # T-layout full-spectrum power, flattened (k1*128 + k2)
    P_t = (np.abs(X) ** 2).reshape(n // 128, 128, order="F").reshape(-1)
    # order="F" on (n1, 128): element [k1, k2] = X[k1 + n1*k2] flattened
    # C-order to k1*128 + k2
    fbT = pf.permute_bins_t(fb, n)
    a = fb @ P_nat
    b = fbT @ P_t
    np.testing.assert_allclose(b, a, rtol=1e-5)


def test_istft_kernel_paths_match_native():
    from audioflux_tpu.transforms.stft import (_istft_tm, _istft_tm_pair,
                                               _stft_impl)
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.types import WindowType

    rng = np.random.default_rng(50)
    x = rng.standard_normal((2, 6 * 2048)).astype(np.float32)
    w = jnp.asarray(get_fft_window(WindowType.HANN, 2048))
    D = _stft_impl(jnp.asarray(x), w, fft_length=2048, slide_length=512,
                   is_pad=False, position=0, mode=0, value1=0.0, value2=0.0)
    spec_tm = jnp.swapaxes(D, -1, -2)  # (..., T, m)
    for mt in (0, 1):
        y0 = _istft_tm(spec_tm, w, fft_length=2048, slide_length=512,
                       method_type=mt, use_kernel=False)
        y1 = _istft_tm(spec_tm, w, fft_length=2048, slide_length=512,
                       method_type=mt, use_kernel=True, interpret=True)
        sc = float(jnp.max(jnp.abs(y0))) + 1e-9
        # interior only: the first/last fft worth of samples divide by
        # window sums just above the 1e-6 clamp, amplifying fft ulps up
        # to ~1e6x — those values are amplified noise in the native path
        # and the reference C alike (the documented istft edge class)
        interior = jnp.abs(y1 - y0)[..., 2048:-2048]
        assert float(jnp.max(interior)) / sc < 1e-4, mt

    a0, b0 = _istft_tm_pair(spec_tm, 0.5 * spec_tm, w, fft_length=2048,
                            slide_length=512, method_type=0,
                            use_kernel=False)
    a1, b1 = _istft_tm_pair(spec_tm, 0.5 * spec_tm, w, fft_length=2048,
                            slide_length=512, method_type=0,
                            use_kernel=True, interpret=True)
    sc = float(jnp.max(jnp.abs(a0))) + 1e-9
    assert float(jnp.max(jnp.abs(a1 - a0)[..., 2048:-2048])) / sc < 1e-4
    assert float(jnp.max(jnp.abs(b1 - b0)[..., 2048:-2048])) / sc < 1e-4


def test_cqt_octave_spec_kernel_path():
    # a low-min_fre plan whose top-octave fft_length reaches the kernel
    from audioflux_tpu.transforms.cqt import CQT
    from audioflux_tpu.utils.convert import note_to_hz

    # few octaves keep the TOP octave low-frequency -> long kernels ->
    # a top-octave fft_length that reaches the four-step kernel range
    cq = CQT(num=36, samplate=32000, low_fre=note_to_hz("C1"),
             slide_length=1024)
    assert cq.fft_length >= 2048, cq.fft_length
    rng = np.random.default_rng(60)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    k = cq._kernels[-1] if isinstance(cq._kernels, (list, tuple)) \
        else cq._kernels
    s0 = cq._octave_spec(x, cq.slide_length, k, use_kernel=False)
    s1 = cq._octave_spec(x, cq.slide_length, k, use_kernel=True,
                         interpret=True)
    sc = float(jnp.max(jnp.abs(s0)))
    assert float(jnp.max(jnp.abs(s1 - s0))) / sc < 1e-4


def test_reassign_none_kernel_path():
    # the BFT spectral hub's plain-STFT route (re_type NONE)
    from audioflux_tpu.transforms.reassign import (_reassign_impl,
                                                   reassign_windows)
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.types import WindowType

    rng = np.random.default_rng(70)
    x = rng.standard_normal((3, 4 * 2048)).astype(np.float32)
    wins = jnp.asarray(np.stack(reassign_windows(
        get_fft_window(WindowType.HANN, 2048))))
    kw = dict(fft_length=2048, slide_length=512, samplate=32000,
              thresh=0.001, re_type=3, order=1, result_type=0,
              is_padding=False)
    o0, _ = _reassign_impl(jnp.asarray(x), wins, use_kernel=False, **kw)
    o1, _ = _reassign_impl(jnp.asarray(x), wins, use_kernel=True,
                           interpret=True, **kw)
    sc = float(jnp.max(jnp.abs(o0)))
    assert o1.shape == o0.shape
    assert float(jnp.max(jnp.abs(o1 - o0))) / sc < 1e-4


@pytest.fixture
def fourstep_interpret(monkeypatch):
    """Route the generic afft entry points through the kernel in interpret
    mode.  Only EAGER afft calls see this (jitted consumers resolve the
    gate at their own trace time), so no jit-cache poisoning."""
    from audioflux_tpu.ops import fft as afft
    monkeypatch.setattr(afft, "_use_fourstep",
                        lambda n: pf.supports.__wrapped__(n)
                        if hasattr(pf.supports, "__wrapped__")
                        else (not (n & (n - 1)) and 2048 <= n <= 32768))
    monkeypatch.setattr(pf, "FORCE_INTERPRET", True)
    yield


def test_afft_generic_fourstep_tier(fourstep_interpret):
    from audioflux_tpu.ops import fft as afft

    rng = np.random.default_rng(80)
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    zr = rng.standard_normal((3, 2048)).astype(np.float32)
    zi = rng.standard_normal((3, 2048)).astype(np.float32)
    z = zr + 1j * zi

    R = np.fft.rfft(x.astype(np.float64))
    r = np.asarray(afft.rfft(jnp.asarray(x)))
    assert np.max(np.abs(r - R)) / np.max(np.abs(R)) < 5e-5

    y = np.asarray(afft.irfft(jnp.asarray(R.astype(np.complex64)), n=2048))
    assert np.max(np.abs(y - x)) < 2e-4

    F = np.fft.fft(z.astype(np.complex128))
    f = np.asarray(afft.fft(jnp.asarray(z.astype(np.complex64))))
    assert np.max(np.abs(f - F)) / np.max(np.abs(F)) < 5e-5

    G = np.fft.ifft(z.astype(np.complex128))
    g = np.asarray(afft.ifft(jnp.asarray(z.astype(np.complex64))))
    assert np.max(np.abs(g - G)) / np.max(np.abs(G)) < 5e-5

    # exact= pins the native tier
    r2 = np.asarray(afft.rfft(jnp.asarray(x), exact=True))
    r3 = np.asarray(jnp.fft.rfft(jnp.asarray(x)))
    np.testing.assert_array_equal(r2, r3)

    # non-last axis + zero padding
    w = rng.standard_normal((2, 2048, 3)).astype(np.float32)
    ra = np.asarray(afft.rfft(jnp.asarray(w), axis=1))
    Ra = np.fft.rfft(w.astype(np.float64), axis=1)
    assert np.max(np.abs(ra - Ra)) / np.max(np.abs(Ra)) < 5e-5
    rp = np.asarray(afft.rfft(jnp.asarray(x[:, :1500]), n=2048))
    Rp = np.fft.rfft(x[:, :1500].astype(np.float64), n=2048)
    assert np.max(np.abs(rp - Rp)) / np.max(np.abs(Rp)) < 5e-5


def test_fft4_under_shard_map():
    # the multi-chip composition pattern: batch-sharded kernel calls
    # inside a shard_map body (interpret mode on the CPU mesh)
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(90)
    x = jnp.asarray(rng.standard_normal((8, 2048)).astype(np.float32))

    def body(xs):
        yr, yi = pf.fft4_fwd(xs, interpret=True)
        return pf.t_to_natural(yr * yr + yi * yi)

    f = shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                  check_vma=False)
    got = np.asarray(jax.jit(f)(x))
    ref = np.abs(np.fft.fft(np.asarray(x).astype(np.float64))) ** 2
    assert got.shape == (8, 2048)
    assert np.max(np.abs(got - ref)) / ref.max() < 1e-4


def test_fft4_autocorr_fused():
    rng = np.random.default_rng(91)
    x = rng.standard_normal((5, 2048)).astype(np.float32)
    y = rng.standard_normal((5, 2048)).astype(np.float32)
    Z = np.fft.fft(x.astype(np.float64) + 1j * y.astype(np.float64))
    ref = 0.5 * np.imag(np.fft.ifft(Z * Z))
    got = np.asarray(pf.fft4_autocorr(jnp.asarray(x), jnp.asarray(y),
                                      interpret=True))
    sc = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / sc < 5e-5


def test_native_fft_scope_pins_tier(monkeypatch):
    from audioflux_tpu.ops import fft as afft
    from audioflux_tpu.ops import backend as bk

    # force the fourstep gate open, then check the scope closes it
    monkeypatch.setattr(afft, "_use_fourstep",
                        afft._use_fourstep.__wrapped__
                        if hasattr(afft._use_fourstep, "__wrapped__")
                        else afft._use_fourstep)
    import audioflux_tpu.ops.pallas_fft as pfm
    monkeypatch.setattr(pfm, "supports", lambda n: True)
    assert afft._use_fourstep(2048)
    with bk.native_fft_scope():
        assert not afft._use_fourstep(2048)
    assert afft._use_fourstep(2048)


def test_pick_tile_b():
    """Divisor-tile selection (r5): no pad/slice glue when a divisor near
    the VMEM target exists; small batches never pad UP to a tile."""
    from audioflux_tpu.ops.pallas_fft import _pick_tile_b
    assert _pick_tile_b(8000, 128) == 125      # divisor in [64, 128]
    assert _pick_tile_b(1024, 128) == 128      # exact multiple
    assert _pick_tile_b(64, 128) == 64         # small batch: one block
    assert _pick_tile_b(1, 128) == 1
    assert _pick_tile_b(8009, 128) == 128      # prime-ish: keep pad path
    assert _pick_tile_b(8000, 256) == 250      # scan stays in [t0/2, t0]
    for B, t0 in [(8000, 128), (1000, 64), (12345, 256), (7, 8)]:
        t = _pick_tile_b(B, t0)
        assert 1 <= t <= max(t0, B)
        if B <= t0:
            assert t == B
