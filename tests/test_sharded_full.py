"""Sequence-parallel full-signal transforms equal their unsharded forms.

CWT/ST/NSGT partition the per-band inverse transforms over the mesh (the
forward FFT is replicated — it is one pass over a <= 2**radix2_exp-sample
signal); CQT partitions the per-octave frame axis; ccwt is the genuinely
time-sharded long-recording path (ppermute halo windows).  Each test runs
on the 8-virtual-device CPU mesh and compares against the single-chip
transform; the device-count sweep (VERDICT r2 item 7) parametrizes the
(data, time) grid over {1,2,4,8} devices.
"""

import jax
import numpy as np
import pytest

import audioflux_tpu as af
from audioflux_tpu.parallel import (make_mesh, sharded_batch_fn,
                                    sharded_ccwt_fn, sharded_cqt_fn,
                                    sharded_cwt_fn, sharded_nsgt_fn,
                                    sharded_st_fn, sharded_synsq_fn)
from audioflux_tpu.types import (SpectralFilterBankScaleType,
                                 WaveletContinueType)

SR = 32000
GRIDS = [(1, 1), (1, 2), (2, 2), (2, 4), (1, 8)]


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1234.5 * t)
         + 0.05 * rng.standard_normal(n))
    return np.stack([x, x[::-1]]).astype(np.float32)  # (2, n)


@pytest.fixture(scope="module")
def cwt_obj():
    return af.CWT(num=28, radix2_exp=11, samplate=SR,
                  wavelet_type=WaveletContinueType.MORSE,
                  scale_type=SpectralFilterBankScaleType.OCTAVE)


@pytest.mark.parametrize("data,time", GRIDS)
def test_sharded_cwt_equals_unsharded(cwt_obj, data, time):
    mesh = make_mesh(data=data, time=time)
    x = _sig(2048, seed=1)
    want = np.asarray(cwt_obj.cwt(x))
    got = np.asarray(sharded_cwt_fn(cwt_obj, mesh)(x))
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_sharded_cwt_det_equals_unsharded(cwt_obj):
    mesh = make_mesh(data=2, time=4)
    x = _sig(2048, seed=2)
    want = np.asarray(cwt_obj.cwt_det(x))
    got = np.asarray(sharded_cwt_fn(cwt_obj, mesh, det=True)(x))
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_sharded_synsq_equals_unsharded(cwt_obj):
    mesh = make_mesh(data=2, time=4)
    x = _sig(2048, seed=3)
    sq = af.Synsq(num=cwt_obj.num, radix2_exp=cwt_obj.radix2_exp,
                  samplate=SR, order=1, thresh=0.001)
    W = cwt_obj.cwt(x)
    want = np.asarray(sq.synsq(W, cwt_obj.scale_type,
                               cwt_obj.fre_band_arr))
    got = np.asarray(sharded_synsq_fn(cwt_obj, sq, mesh)(x))
    # same op graph partitioned over bands; only each output bin's <= num-
    # term accumulation order changes
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.parametrize("data,time", GRIDS)
def test_sharded_st_equals_unsharded(data, time):
    mesh = make_mesh(data=data, time=time)
    x = _sig(1024, seed=4)
    st = af.ST(radix2_exp=10, samplate=SR, min_index=1, max_index=100)
    want = np.asarray(st.st(x))
    got = np.asarray(sharded_st_fn(st, mesh)(x))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize("data,time", GRIDS)
def test_sharded_nsgt_equals_unsharded(data, time):
    mesh = make_mesh(data=data, time=time)
    x = _sig(2048, seed=5)
    ns = af.NSGT(num=24, radix2_exp=11, samplate=SR,
                 scale_type=SpectralFilterBankScaleType.OCTAVE)
    want = np.asarray(ns.nsgt(x))
    got = np.asarray(sharded_nsgt_fn(ns, mesh)(x))
    # Bluestein chirp-z vs bucketed FFT rounding
    np.testing.assert_allclose(got, want, atol=5e-6 * np.abs(want).max())


@pytest.mark.parametrize("data,time", [(1, 2), (2, 4), (1, 8)])
def test_sharded_cqt_equals_unsharded(data, time):
    mesh = make_mesh(data=data, time=time)
    x = _sig(8192, seed=6)
    cq = af.CQT(num=24, samplate=SR, bin_per_octave=12, low_fre=220.0)
    want = np.asarray(cq.cqt(x))
    got = np.asarray(sharded_cqt_fn(cq, mesh)(x))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize("data,time", [(1, 2), (2, 2), (2, 4), (1, 8)])
def test_sharded_ccwt_equals_unsharded(cwt_obj, data, time):
    mesh = make_mesh(data=data, time=time)
    step = cwt_obj.fft_length // 2
    # per-shard block must be a multiple of step; use 2 windows per shard
    n = time * 2 * step
    x = _sig(n, seed=7)
    want = np.asarray(cwt_obj.ccwt(x))
    got = np.asarray(sharded_ccwt_fn(cwt_obj, mesh)(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


@pytest.mark.parametrize("data,time", [(1, 2), (2, 4), (1, 8)])
def test_sharded_fst_equals_unsharded(data, time):
    """Band-partitioned FST expansion == single-chip FST."""
    from audioflux_tpu.parallel import sharded_fst_fn
    mesh = make_mesh(data=data, time=time)
    fs = af.FST(radix2_exp=9, samplate=SR, min_index=1, max_index=200)
    x = _sig(512, seed=11)
    want = np.asarray(fs.fst(x))
    got = np.asarray(sharded_fst_fn(fs, mesh)(x))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)  # disjoint gathers: bit-equal


@pytest.mark.parametrize("data,time", [(1, 2), (2, 4), (1, 8)])
def test_sharded_cst_equals_unsharded(data, time):
    """Time-sharded long-recording S-transform == single-chip splice."""
    from audioflux_tpu.parallel import sharded_cst_fn
    mesh = make_mesh(data=data, time=time)
    st = af.ST(radix2_exp=10, samplate=SR, min_index=1, max_index=64)
    step = st.fft_length // 2
    n = time * 2 * step  # 2 windows per shard
    x = _sig(n, seed=9)
    want = np.asarray(st.cst(x))
    got = np.asarray(sharded_cst_fn(st, mesh)(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


def test_cst_matches_windowed_st():
    """The splice's interior windows are verbatim middle halves of plain
    ST windows (head/tail kept at the edges)."""
    st = af.ST(radix2_exp=9, samplate=SR, min_index=1, max_index=32)
    L = st.fft_length
    step = L // 2
    x = _sig(4 * step, seed=10)
    out = np.asarray(st.cst(x))
    w1 = np.asarray(st.st(x[..., step:step + L]))
    np.testing.assert_array_equal(
        out[..., step + L // 4: step + 3 * (L // 4)],
        w1[..., L // 4:3 * (L // 4)])


def test_sharded_ccwt_unaligned_block_raises(cwt_obj):
    """Per-shard blocks must be step-aligned; a clear error, not garbage."""
    mesh = make_mesh(data=1, time=4)
    step = cwt_obj.fft_length // 2
    x = _sig(4 * (step + 128), seed=8)  # shard blocks not multiples of step
    with pytest.raises(Exception):
        np.asarray(sharded_ccwt_fn(cwt_obj, mesh)(x))


# ---------------------------------------------------------------------------
# generic batch-of-files data parallelism (SURVEY §2.10 row 1, config 5)
# ---------------------------------------------------------------------------

def test_sharded_batch_cqt_bit_equal():
    mesh = make_mesh(data=8, time=1)
    cq = af.CQT(num=24, samplate=SR, bin_per_octave=12)
    x = np.concatenate([_sig(4096, seed=s) for s in range(8)])  # (16, 4096)
    want = np.asarray(cq._cqt_run(x, cq._scale_vec()))
    got = np.asarray(sharded_batch_fn(
        lambda v: cq._cqt_run(v, cq._scale_vec()), mesh)(x))
    np.testing.assert_array_equal(got, want)


def test_sharded_batch_mir_pipeline():
    """Batch-of-files spectral MIR chain sharded over 'data'."""
    mesh = make_mesh(data=4, time=2)
    st = af.MelSpectrogram(num=32, samplate=SR, radix2_exp=9,
                           slide_length=128)
    x = np.concatenate([_sig(4096, seed=s) for s in range(4)])  # (8, 4096)

    def pipeline(v):
        spec = st.spectrogram(v)
        flux = ((spec[..., 1:] - spec[..., :-1]).clip(min=0) ** 2).sum(-2)
        return {"spec": spec, "flux": flux}

    want = jax.tree_util.tree_map(np.asarray, pipeline(x))
    got = jax.tree_util.tree_map(
        np.asarray, sharded_batch_fn(pipeline, mesh)(x))
    np.testing.assert_array_equal(got["spec"], want["spec"])
    # the flux reduction's vectorization differs under GSPMD
    np.testing.assert_allclose(got["flux"], want["flux"],
                               rtol=1e-6, atol=1e-6 * want["flux"].max())


def test_sharded_wsst_equals_unsharded():
    from audioflux_tpu.parallel import sharded_wsst_fn
    mesh = make_mesh(data=2, time=4)
    x = _sig(2048, seed=9)
    ws = af.WSST(num=28, radix2_exp=11, samplate=SR,
                 wavelet_type=WaveletContinueType.MORSE,
                 scale_type=SpectralFilterBankScaleType.OCTAVE)
    sq_w, D_w = ws.wsst(x)
    sq_g, D_g = sharded_wsst_fn(ws, mesh)(x)
    peak = np.abs(np.asarray(D_w)).max()
    np.testing.assert_allclose(np.asarray(D_g), np.asarray(D_w),
                               atol=2e-5 * peak)
    peak_s = np.abs(np.asarray(sq_w)).max()
    np.testing.assert_allclose(np.asarray(sq_g), np.asarray(sq_w),
                               atol=2e-5 * peak_s)


def test_sharded_pwt_equals_unsharded():
    from audioflux_tpu.parallel import sharded_pwt_fn
    from audioflux_tpu.transforms.pwt import PWT
    from audioflux_tpu.types import SpectralFilterBankScaleType as S
    mesh = make_mesh(data=2, time=4)
    obj = PWT(num=24, radix2_exp=11, samplate=SR, scale_type=S.MEL)
    x = _sig(2048, seed=9)
    want = np.asarray(obj.pwt(x))
    got = np.asarray(sharded_pwt_fn(obj, mesh)(x))
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_sharded_batch_map_fn_with_kernel():
    """shard_map batch wrapper: guaranteed per-shard Pallas execution
    (the GSPMD wrapper may replicate opaque custom calls on real pods).
    Drives the HPSS kernel path in interpret mode through the mesh."""
    import jax.numpy as jnp
    from functools import partial
    from audioflux_tpu.mir.hpss import _hpss_impl
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.parallel import sharded_batch_map_fn, make_mesh
    from audioflux_tpu.types import WindowType

    mesh8 = make_mesh(data=8, time=1)

    w = jnp.asarray(get_fft_window(WindowType.HAMM, 2048))
    fn = partial(_hpss_impl, window=w, fft_length=2048, slide_length=512,
                 h_order=21, p_order=31, use_kernel=True, interpret=True)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((8, 32768)).astype(np.float32))
    h0, p0 = fn(x)
    sh = sharded_batch_map_fn(lambda a: fn(a), mesh8)
    h1, p1 = sh(x)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h0))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))


# ---------------------------------------------------------------------------
# shard_map kernel-tier twins (VERDICT r4 item 1): each band-parallel
# wrapper gets a shard_map form that keeps the Pallas kernel tiers enabled
# per shard (the GSPMD forms pin the native fft tier while tracing).
# mode="shard_map" forces the twin on the CPU mesh; the fused-CWT twins
# additionally run their kernel in interpret mode for real kernel-path
# equality (the fft4-tier twins drive the kernel via the fourstep fixture).
# ---------------------------------------------------------------------------

def _kernel_cwt_ref(obj, x, det=False):
    """Single-chip forced-kernel (interpret) CWT — the right oracle for
    the kernel twins: the twin's claim is 'same graph, distributed'."""
    import jax.numpy as jnp
    from audioflux_tpu.transforms.cwt import _cwt_conv_body
    if det:
        obj.enable_det(True)
    bank = obj._det_bank if det else obj._bank
    return _cwt_conv_body(jnp.asarray(x, jnp.float32), jnp.asarray(bank),
                          det=det, pad_length=obj.pad_length,
                          data_length=obj.data_length,
                          row_h=(obj._det_row_h if det else obj._row_h),
                          force_kernel=True, interpret=True)


@pytest.fixture(scope="module")
def cwt_k_obj():
    # radix2_exp=14 is pallas_cwt's support floor (w_len = 32768)
    return af.CWT(num=12, radix2_exp=14, samplate=SR,
                  wavelet_type=WaveletContinueType.MORSE,
                  scale_type=SpectralFilterBankScaleType.OCTAVE)


@pytest.mark.parametrize("data,time", [(2, 4), (1, 8), (2, 2)])
def test_smap_cwt_kernel_equals_single_chip(cwt_k_obj, data, time):
    """Band-sharded fused-kernel CWT == single-chip kernel path (both
    interpret mode on the CPU mesh); also vs the exact XLA transform at
    the kernel's documented ~1e-5 accuracy class."""
    mesh = make_mesh(data=data, time=time)
    x = _sig(16384, seed=20)
    got = np.asarray(sharded_cwt_fn(cwt_k_obj, mesh, mode="shard_map",
                                    interpret=True)(x))
    want_k = np.asarray(_kernel_cwt_ref(cwt_k_obj, x))
    peak = np.abs(want_k).max()
    np.testing.assert_allclose(got, want_k, atol=1e-6 * peak)
    want_exact = np.asarray(cwt_k_obj.cwt(x))
    np.testing.assert_allclose(got, want_exact,
                               atol=5e-5 * np.abs(want_exact).max())


def test_smap_cwt_det_kernel_equals_single_chip(cwt_k_obj):
    mesh = make_mesh(data=2, time=4)
    x = _sig(16384, seed=21)
    got = np.asarray(sharded_cwt_fn(cwt_k_obj, mesh, det=True,
                                    mode="shard_map", interpret=True)(x))
    want_k = np.asarray(_kernel_cwt_ref(cwt_k_obj, x, det=True))
    np.testing.assert_allclose(got, want_k,
                               atol=1e-6 * np.abs(want_k).max())


@pytest.mark.parametrize("data,time", [(2, 4), (1, 8)])
def test_smap_cwt_xla_band_partition(cwt_obj, data, time):
    """Forced shard_map twin without the kernel (small radix, CPU): the
    band partitioning + zero-row padding alone must be exact (28 bands
    do not divide 4 or 8 shards — exercises the pad/slice)."""
    mesh = make_mesh(data=data, time=time)
    x = _sig(2048, seed=22)
    want = np.asarray(cwt_obj.cwt(x))
    got = np.asarray(sharded_cwt_fn(cwt_obj, mesh, mode="shard_map")(x))
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


def test_smap_cqt_auto_falls_back_on_small_batch(monkeypatch):
    """The CQT twin batches over the WHOLE mesh (stricter than GSPMD's
    B % data requirement), so its auto mode dispatches per call: batches
    that divide the full mesh take the shard_map twin, others fall back
    to the GSPMD frame-parallel form instead of raising."""
    from audioflux_tpu.ops import pallas_fft as pf
    monkeypatch.setattr(pf, "supports",
                        lambda n: not (n & (n - 1)) and 2048 <= n <= 32768)
    monkeypatch.setattr(pf, "FORCE_INTERPRET", True)  # CPU backend
    mesh = make_mesh(data=2, time=4)
    # this plan's top-octave fft is 2048 — exactly the kernel-tier class
    cq = af.CQT(num=24, samplate=SR, bin_per_octave=12, low_fre=220.0)
    fn = sharded_cqt_fn(cq, mesh, mode="auto")
    x2 = _sig(8192, seed=31)                       # B=2: GSPMD fallback
    want2 = np.asarray(cq.cqt(x2))
    np.testing.assert_allclose(np.asarray(fn(x2)), want2,
                               atol=2e-6 * np.abs(want2).max())
    x8 = np.concatenate([_sig(8192, seed=s) for s in range(32, 36)])
    want8 = np.asarray(cq.cqt(x8))                 # B=8: shard_map twin
    np.testing.assert_allclose(np.asarray(fn(x8)), want8,
                               atol=2e-6 * np.abs(want8).max())


@pytest.mark.parametrize("order", [1, 2])
def test_smap_synsq_equals_single_chip(cwt_k_obj, order):
    """Band-sharded synsq twin (kernel CWT + partial scatter +
    psum_scatter) == single-chip synsq on the SAME kernel CWT matrix.
    order=2 exercises the all_gather composition."""
    mesh = make_mesh(data=2, time=4)
    x = _sig(16384, seed=25)
    sq = af.Synsq(num=cwt_k_obj.num, radix2_exp=cwt_k_obj.radix2_exp,
                  samplate=SR, order=order, thresh=0.001)
    W = _kernel_cwt_ref(cwt_k_obj, x)
    want = np.asarray(sq.synsq(W, cwt_k_obj.scale_type,
                               cwt_k_obj.fre_band_arr))
    got = np.asarray(sharded_synsq_fn(cwt_k_obj, sq, mesh,
                                      mode="shard_map", interpret=True)(x))
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_smap_wsst_equals_single_chip():
    """Band-sharded WSST twin == single-chip squeeze on the same kernel
    CWT/derivative pair."""
    from audioflux_tpu.parallel import sharded_wsst_fn
    from audioflux_tpu.transforms.wsst import _squeeze
    mesh = make_mesh(data=2, time=4)
    x = _sig(16384, seed=26)
    ws = af.WSST(num=12, radix2_exp=14, samplate=SR,
                 wavelet_type=WaveletContinueType.MORSE,
                 scale_type=SpectralFilterBankScaleType.OCTAVE)
    D = _kernel_cwt_ref(ws._cwt, x)
    dD = _kernel_cwt_ref(ws._cwt, x, det=True)
    import jax.numpy as jnp
    want_sq = np.asarray(_squeeze(D, dD,
                                  jnp.asarray(ws._cwt.fre_band_arr),
                                  scale_kind="log", num=ws.num,
                                  samplate=float(ws.samplate),
                                  thresh=ws.thresh, order=ws.order))
    got_sq, got_D = sharded_wsst_fn(ws, mesh, mode="shard_map",
                                    interpret=True)(x)
    np.testing.assert_allclose(np.asarray(got_D), np.asarray(D),
                               atol=1e-6 * np.abs(np.asarray(D)).max())
    np.testing.assert_allclose(np.asarray(got_sq), want_sq,
                               atol=1e-5 * np.abs(want_sq).max())


@pytest.mark.parametrize("data,time", [(2, 4), (1, 8)])
def test_smap_st_equals_unsharded(data, time):
    """Bin-sharded shard_map ST == single-chip ST (XLA tier on CPU; the
    kernel tier engages per shard on chip via the same body)."""
    mesh = make_mesh(data=data, time=time)
    x = _sig(2048, seed=27)
    st = af.ST(radix2_exp=11, samplate=SR, min_index=1, max_index=100)
    want = np.asarray(st.st(x))
    got = np.asarray(sharded_st_fn(st, mesh, mode="shard_map")(x))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.fixture
def fourstep_interpret_full(monkeypatch):
    """Route the generic afft entry points through the four-step kernel in
    interpret mode (size-only gate, no TPU check).  Only EAGER afft calls
    and FRESHLY-BUILT jits see this — the twin builders trace fresh, so
    no module-level jit cache is poisoned (the r3 gate-writing lesson)."""
    from audioflux_tpu.ops import fft as afft
    from audioflux_tpu.ops import pallas_fft as pf
    monkeypatch.setattr(afft, "_use_fourstep",
                        lambda n: not (n & (n - 1)) and 2048 <= n <= 32768)
    monkeypatch.setattr(pf, "FORCE_INTERPRET", True)
    yield


def test_smap_st_fourstep_kernel(fourstep_interpret_full):
    """The shard_map ST twin with the generic afft entry points routed
    through the four-step kernel (interpret): per-shard kernel execution
    equals the single-chip kernel-tier ST (eager _st_body under the same
    gate — the module-level _st_impl jit may hold a non-kernel trace)."""
    import jax.numpy as jnp
    from audioflux_tpu.transforms.st import _st_body
    mesh = make_mesh(data=2, time=4)
    x = _sig(2048, seed=28)
    st = af.ST(radix2_exp=11, samplate=SR, min_index=1, max_index=40)
    want = np.asarray(_st_body(jnp.asarray(x), jnp.asarray(st._windows),
                               jnp.asarray(st.bin_arr), st.fft_length))
    got = np.asarray(sharded_st_fn(st, mesh, mode="shard_map")(x))
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


@pytest.mark.parametrize("data,time", [(2, 4), (1, 8)])
def test_smap_nsgt_equals_unsharded(data, time):
    mesh = make_mesh(data=data, time=time)
    x = _sig(2048, seed=29)
    ns = af.NSGT(num=24, radix2_exp=11, samplate=SR,
                 scale_type=SpectralFilterBankScaleType.OCTAVE)
    want = np.asarray(ns.nsgt(x))
    got = np.asarray(sharded_nsgt_fn(ns, mesh, mode="shard_map")(x))
    np.testing.assert_allclose(got, want, atol=5e-6 * np.abs(want).max())


@pytest.mark.parametrize("data,time", [(2, 4), (1, 8)])
def test_smap_fst_bit_equal(data, time):
    from audioflux_tpu.parallel import sharded_fst_fn
    mesh = make_mesh(data=data, time=time)
    fs = af.FST(radix2_exp=9, samplate=SR, min_index=1, max_index=200)
    x = _sig(512, seed=30)
    want = np.asarray(fs.fst(x))
    got = np.asarray(sharded_fst_fn(fs, mesh, mode="shard_map")(x))
    np.testing.assert_array_equal(got, want)  # disjoint gathers: bit-equal


def test_smap_cqt_batch_equals_unsharded():
    mesh = make_mesh(data=2, time=4)
    cq = af.CQT(num=24, samplate=SR, bin_per_octave=12, low_fre=220.0)
    x = np.concatenate([_sig(8192, seed=s) for s in range(4)])  # (8, 8192)
    want = np.asarray(cq.cqt(x))
    got = np.asarray(sharded_cqt_fn(cq, mesh, mode="shard_map")(x))
    np.testing.assert_array_equal(got, want)  # same graph per batch slice
