"""Streaming STFT tail-carry equals one-shot STFT (isContinue semantics)."""

import numpy as np

from audioflux_tpu.transforms.stft import STFT, StreamingSTFT
from audioflux_tpu.types import WindowType


def test_streaming_matches_oneshot(signals):
    x = signals["sine"][:20000]
    one = STFT(radix2_exp=10, window_type=WindowType.HANN, slide_length=256)
    full = np.asarray(one.stft(x))

    st = StreamingSTFT(radix2_exp=10, window_type=WindowType.HANN,
                       slide_length=256)
    cols = []
    for start in range(0, len(x), 3000):
        out = st.process(x[start:start + 3000])
        if out.shape[-1]:
            cols.append(out)
    stream = np.concatenate(cols, axis=-1)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=1e-5)


def test_streaming_short_chunks(signals):
    x = signals["sine"][:5000]
    st = StreamingSTFT(radix2_exp=10, slide_length=256)
    outs = [st.process(x[i:i + 100]) for i in range(0, 5000, 100)]
    total = sum(o.shape[-1] for o in outs)
    assert total == (5000 - 1024) // 256 + 1


def test_streaming_chunk_fuzz(signals):
    """Randomized chunk sizes (incl. tiny and frame-straddling) all
    reproduce the one-shot STFT exactly, for two window/slide configs."""
    rng = np.random.default_rng(11)
    x = np.asarray(signals["chirp"][:24000], np.float32)
    for r2e, slide in ((10, 256), (9, 128)):
        one = STFT(radix2_exp=r2e, window_type=WindowType.HANN,
                   slide_length=slide)
        full = np.asarray(one.stft(x))
        for trial in range(4):
            st = StreamingSTFT(radix2_exp=r2e, window_type=WindowType.HANN,
                               slide_length=slide)
            cols, pos = [], 0
            while pos < len(x):
                step = int(rng.integers(1, 4000))
                out = st.process(x[pos:pos + step])
                if out.shape[-1]:
                    cols.append(out)
                pos += step
            stream = np.concatenate(cols, axis=-1)
            assert stream.shape == full.shape, (trial, stream.shape)
            np.testing.assert_allclose(stream, full, atol=1e-5)


def test_streaming_reset(signals):
    x = np.asarray(signals["sine"][:8192], np.float32)
    st = StreamingSTFT(radix2_exp=10, slide_length=256)
    a = st.process(x)
    st.reset()
    b = st.process(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_tail_equals_sharded_halo(signals):
    """The carried streaming tail and the sharded ppermute halo are the
    same samples: feeding shard-sized chunks reproduces the sharded STFT
    output (frame-block sharding == isContinue chunking)."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from audioflux_tpu.ops.window import get_fft_window
    from audioflux_tpu.parallel import make_mesh, sharded_stft_fn

    fft, slide = 1024, 256
    n = 4 * 8 * slide  # 4 time shards
    x = np.asarray(signals["chirp"][:n], np.float32)
    mesh = make_mesh(data=1, time=4)
    win = get_fft_window(WindowType.HANN, fft)
    stf = sharded_stft_fn(mesh, fft, slide, win)
    xs = jax.device_put(x[None], NamedSharding(mesh, P("data", "time")))
    D_sharded = np.asarray(stf(xs))[0].swapaxes(-1, -2)  # (fre, T)

    st = StreamingSTFT(radix2_exp=10, window_type=WindowType.HANN,
                       slide_length=slide)
    cols = []
    for i in range(4):
        out = st.process(x[i * n // 4:(i + 1) * n // 4])
        if out.shape[-1]:
            cols.append(out)
    stream = np.concatenate(cols, axis=-1)
    assert stream.shape == D_sharded.shape
    np.testing.assert_allclose(stream, D_sharded, atol=2e-4, rtol=2e-6)


def test_resample_streaming_chunk_fuzz(signals):
    """Streaming resample (tail_carry) under randomized chunking matches
    the whole-shot interior for several chunkings (moved here from the
    CQT suite and widened; see also test_cqt.py for the C-exact lengths)."""
    from audioflux_tpu.dsp.resample import Resample

    rng = np.random.default_rng(5)
    x = np.asarray(signals["chirp"][:30000], np.float32)
    rw = Resample()
    rw.set_samplate(32000, 22050)
    yw = np.asarray(rw.resample(x))
    for trial in range(3):
        cuts = np.sort(rng.integers(1000, len(x) - 1000, size=3))
        chunks = np.split(x, cuts)
        rc = Resample(is_continue=True, tail_carry=True)
        rc.set_samplate(32000, 22050)
        y = np.concatenate([np.asarray(rc.resample(c)) for c in chunks])
        carried = len(x) - len(rc._tail)
        assert carried % 640 == 0 and len(y) == carried * 441 // 640
        mism = np.abs(y - yw[:len(y)]) > 1e-4
        assert mism.mean() < 0.02, (trial, mism.mean())
