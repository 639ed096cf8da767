"""Sharding equality tests: N-chip (8 virtual CPU devices) == single-chip."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.parallel import (
    make_mesh, sharded_istft_fn, sharded_spectrogram_fn, sharded_stft_fn,
)
from audioflux_tpu.parallel.sharded import valid_frames
from audioflux_tpu.transforms.spectrogram import MelSpectrogram
from audioflux_tpu.types import WindowType

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

FFT, SLIDE, SR = 2048, 512, 32000


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, time=4)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    return (rng.standard_normal((4, 32768)) * 0.2).astype(np.float32)


def test_sharded_mel_equals_single(mesh, batch):
    plan = MelSpectrogram(num=128, samplate=SR, radix2_exp=11,
                          slide_length=SLIDE)
    fn = sharded_spectrogram_fn(plan, mesh, with_xxcc=13)
    xs = jax.device_put(batch, NamedSharding(mesh, P("data", "time")))
    spec, cc = fn(xs)
    ref_spec = np.asarray(plan.spectrogram(batch))
    ref_cc = np.asarray(plan.mfcc(ref_spec, 13))
    # trimmed semantics: full-array equality, no caller-side slicing
    np.testing.assert_array_equal(np.asarray(spec), ref_spec)
    np.testing.assert_array_equal(np.asarray(cc), ref_cc)


def test_sharded_stft_istft_roundtrip(mesh, batch):
    win = get_fft_window(WindowType.HANN, FFT)
    stf = sharded_stft_fn(mesh, FFT, SLIDE, win)
    istf = sharded_istft_fn(mesh, FFT, SLIDE, win)
    xs = jax.device_put(batch, NamedSharding(mesh, P("data", "time")))
    y = np.asarray(istf(stf(xs)))
    assert y.shape == batch.shape
    n = batch.shape[-1]
    err = np.abs(y[:, FFT:n - FFT] - batch[:, FFT:n - FFT]).max()
    assert err < 1e-3


def test_sharded_stft_matches_unsharded_frames(mesh, batch):
    from audioflux_tpu.transforms.stft import stft as stft_fn
    win = get_fft_window(WindowType.HANN, FFT)
    stf = sharded_stft_fn(mesh, FFT, SLIDE, win)
    xs = jax.device_put(batch, NamedSharding(mesh, P("data", "time")))
    D = np.asarray(stf(xs))  # (B, T_valid, fre)
    ref = np.asarray(stft_fn(batch, FFT, SLIDE, window=win))  # (B, fre, T)
    assert D.shape[1] == valid_frames(batch.shape[-1], FFT, SLIDE)
    np.testing.assert_array_equal(D.swapaxes(-1, -2), ref)


def test_sharded_spectral_stats():
    from audioflux_tpu.parallel import make_mesh, sharded_spectral_stats_fn
    import jax, numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(data=2, time=4)
    rng = np.random.default_rng(0)
    S = rng.random((4, 16, 64)).astype(np.float32)
    fn = sharded_spectral_stats_fn(mesh)
    Sd = jax.device_put(S, NamedSharding(mesh, P("data", None, "time")))
    out = fn(Sd)
    np.testing.assert_allclose(np.asarray(out["mean"]), S.mean(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["max"]), S.max(-1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["var"]), S.var(-1),
                               rtol=1e-3, atol=1e-5)


def test_batch_runner(tmp_path):
    import numpy as np
    from audioflux_tpu.parallel import make_mesh, BatchRunner
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram
    from audioflux_tpu.io.wave import write as wav_write
    mesh = make_mesh(data=2, time=4)
    plan = MelSpectrogram(num=32, samplate=32000, radix2_exp=10,
                          slide_length=256)
    clip = 256 * 4 * 16  # divisible by time_shards*slide
    paths = []
    for i in range(4):
        t = np.arange(clip) / 32000
        x = (0.4 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(np.float32)
        p = tmp_path / f"c{i}.wav"
        wav_write(str(p), x, 32000)
        paths.append(str(p))
    runner = BatchRunner(plan, mesh, clip_length=clip)
    out, good = runner.run_files(paths)
    assert good == 4
    T = (clip - 1024) // 256 + 1  # trimmed to the unsharded frame count
    assert np.asarray(out).shape == (4, 32, T)


def test_sharded_fused_kernel_path():
    """Fused Pallas kernel under shard_map (interpret mode on CPU mesh)."""
    import audioflux_tpu as af
    obj = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512)
    mesh = af.parallel.make_mesh(data=2, time=4)
    n = 4 * 512 * 16
    fn = af.parallel.sharded_spectrogram_fn(
        obj, mesh, with_xxcc=13, fused=True, fused_tile=8,
        fused_interpret=True)
    x = (np.random.default_rng(0).standard_normal((4, n)) * 0.2
         ).astype(np.float32)
    mel, cc = fn(x)
    fn0 = af.parallel.sharded_spectrogram_fn(obj, mesh, with_xxcc=13)
    mel0, cc0 = fn0(x)
    assert np.max(np.abs(np.asarray(mel) - np.asarray(mel0))) <= (
        1e-4 * np.max(np.abs(np.asarray(mel0))))
    assert np.max(np.abs(np.asarray(cc) - np.asarray(cc0))) <= (
        1e-4 * np.max(np.abs(np.asarray(cc0))))


def test_batch_runner_resumable(tmp_path):
    """Kill-and-resume: every file processed exactly once across runs."""
    import numpy as np
    from audioflux_tpu.parallel import make_mesh, BatchRunner
    from audioflux_tpu.transforms.spectrogram import MelSpectrogram
    from audioflux_tpu.io.wave import write as wav_write
    mesh = make_mesh(data=2, time=4)
    plan = MelSpectrogram(num=32, samplate=32000, radix2_exp=10,
                          slide_length=256)
    clip = 256 * 4 * 16
    paths = []
    for i in range(6):
        t = np.arange(clip) / 32000
        x = (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        p = tmp_path / f"r{i}.wav"
        wav_write(str(p), x, 32000)
        paths.append(str(p))
    runner = BatchRunner(plan, mesh, clip_length=clip)
    out_dir = str(tmp_path / "out")
    # simulated kill after 1 chunk of 2
    n1, sk1 = runner.run_files_resumable(paths, out_dir, chunk_size=2,
                                         max_chunks=1)
    assert (n1, sk1) == (2, 0)
    # "restart": a fresh runner resumes from the manifest
    runner2 = BatchRunner(plan, mesh, clip_length=clip)
    n2, sk2 = runner2.run_files_resumable(paths, out_dir, chunk_size=2)
    assert (n2, sk2) == (4, 2)
    import os, json
    done = [json.loads(l)["path"]
            for l in open(os.path.join(out_dir, "manifest.jsonl"))]
    assert sorted(done) == sorted(paths)      # exactly once each
    assert len(done) == len(set(done))
    for p in paths:
        base = os.path.splitext(os.path.basename(p))[0] + ".npy"
        arr = np.load(os.path.join(out_dir, base))
        T = (clip - 1024) // 256 + 1
        assert arr.shape == (32, T)
    # idempotent third run
    n3, sk3 = runner2.run_files_resumable(paths, out_dir, chunk_size=2)
    assert (n3, sk3) == (0, 6)


def test_pipeline_chain_matches_composition():
    """GPipe-style op-chain staging (SURVEY §2.10 pipeline row): a
    frame->DFT-power->mel->log chain staged over a 4-device pipe axis
    equals the direct composition."""
    from audioflux_tpu.parallel.pipeline import pipeline_chain_fn
    from audioflux_tpu.filterbank.auditory import auditory_filter_bank
    from audioflux_tpu.ops.frame import frame_signal
    from audioflux_tpu.types import (SpectralFilterBankNormalType,
                                     SpectralFilterBankScaleType,
                                     SpectralFilterBankStyleType)

    fft, slide, n = 1024, 256, 8192
    T = (n - fft) // slide + 1
    m = fft // 2 + 1
    num_mel = 32
    win = np.asarray(get_fft_window(WindowType.HANN, fft))
    fb, _, _ = auditory_filter_bank(
        num_mel, fft, SR, SpectralFilterBankScaleType.MEL,
        SpectralFilterBankStyleType.SLANEY,
        SpectralFilterBankNormalType.NONE, 0.0, SR / 2.0, 12)
    fb = np.asarray(fb)
    k = np.arange(fft)[:, None] * np.arange(m)[None, :]
    dr = np.cos(-2 * np.pi * k / fft).astype(np.float32)
    di = np.sin(-2 * np.pi * k / fft).astype(np.float32)

    import jax.numpy as jnp

    def s_frame(x):          # (mb, n) -> (mb, T, fft)
        return frame_signal(x, fft, slide) * jnp.asarray(win)

    def s_power(f):          # (mb, T, fft) -> (mb, T, m)
        re = f @ jnp.asarray(dr)
        im = f @ jnp.asarray(di)
        return re * re + im * im

    def s_mel(p):            # (mb, T, m) -> (mb, T, num_mel)
        return p @ jnp.asarray(fb).T

    def s_log(y):            # elementwise
        return jnp.log10(jnp.maximum(y, 1e-8))

    stages = [s_frame, s_power, s_mel, s_log]
    shapes = [(n,), (T, fft), (T, m), (T, num_mel), (T, num_mel)]
    mesh4 = make_mesh(data=2, time=4)
    run = pipeline_chain_fn(stages, shapes, mesh4, axis="time", n_micro=4)

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((8, n)) * 0.2).astype(np.float32)
    got = np.asarray(run(x))
    want = np.asarray(s_log(s_mel(s_power(s_frame(jnp.asarray(x))))))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# device-count sweep (VERDICT r2 item 7): (data, time) grid shapes x uneven
# signal tails, STFT family — backs the README multi-chip scaling model
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("data,time", [(1, 1), (1, 2), (2, 2), (4, 2),
                                       (2, 4), (1, 8)])
@pytest.mark.parametrize("tail", [0, 3 * SLIDE])
def test_device_count_sweep(data, time, tail):
    """Sharded mel+mfcc equals single-chip on every mesh grid, including
    signal lengths whose final frames spill unevenly across shards."""
    plan = MelSpectrogram(num=64, samplate=SR, radix2_exp=11,
                          slide_length=SLIDE)
    mesh_ = make_mesh(data=data, time=time)
    n = 8 * time * SLIDE + tail
    if n % (time * SLIDE):
        n -= n % (time * SLIDE)  # block multiple per shard, tail in frames
    rng = np.random.default_rng(data * 16 + time + tail)
    x = (rng.standard_normal((2 * data, n)) * 0.2).astype(np.float32)
    fn = sharded_spectrogram_fn(plan, mesh_, with_xxcc=13)
    spec, cc = fn(x)
    # single-chip reference (trim to the sharded output's frame count)
    want = np.asarray(plan.spectrogram(x[:, :]))
    tv = valid_frames(n, plan.fft_length, SLIDE)
    np.testing.assert_allclose(np.asarray(spec), want[..., :tv],
                               rtol=2e-6, atol=2e-6 * np.abs(want).max())
    # per-shard frame balance: every time shard owns n/(time*SLIDE) slots
    assert (n // SLIDE) % time == 0
