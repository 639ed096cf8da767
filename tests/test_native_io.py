"""Native C++ WAV IO + batch loader (compiled on demand via g++)."""

import numpy as np
import pytest

from audioflux_tpu.io import native
from audioflux_tpu.io.wave import read as py_read, write as py_write


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    sr = 32000
    paths = []
    for i, f0 in enumerate((220.0, 440.0, 880.0)):
        t = np.arange(sr // 2) / sr
        x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        p = d / f"tone{i}.wav"
        py_write(str(p), x, sr)
        paths.append(str(p))
    return paths


def test_native_available():
    assert native.available(), "g++ build of native/wavio.cpp failed"


def test_native_read_matches_python(wav_files):
    for p in wav_files:
        nx, nsr = native.wav_read(p)
        px, psr = py_read(p)
        assert nsr == psr
        np.testing.assert_allclose(nx, px, atol=1e-4)


def test_native_write_roundtrip(tmp_path):
    x = (0.3 * np.sin(2 * np.pi * 100 * np.arange(8000) / 32000)
         ).astype(np.float32)
    p = str(tmp_path / "rt.wav")
    native.wav_write(p, x, 32000)
    y, sr = native.wav_read(p)
    assert sr == 32000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_batch_loader(wav_files):
    batch, good = native.load_batch(wav_files, length=20000, num_threads=2)
    assert good == 3
    assert batch.shape == (3, 20000)
    # first half second has signal, padding after 16000 is zero
    assert np.abs(batch[:, :16000]).max() > 0.4
    np.testing.assert_array_equal(batch[:, 16000:], 0)


def test_batch_loader_missing_file(wav_files, tmp_path):
    paths = wav_files + [str(tmp_path / "missing.wav")]
    batch, good = native.load_batch(paths, length=1000)
    assert good == 3
    np.testing.assert_array_equal(batch[-1], 0)


def test_prefetch_loader(wav_files, tmp_path):
    # 7 files (incl. one missing) in batches of 2, depth 2: every yielded
    # batch must equal the synchronous load_batch of the same chunk
    paths = wav_files * 2 + [str(tmp_path / "missing.wav")]
    got = list(native.PrefetchLoader(paths, batch_size=2, length=12000,
                                     num_threads=3, depth=2))
    assert len(got) == 4
    for i, (batch, good) in enumerate(got):
        chunk = paths[2 * i:2 * i + 2]
        ref, ref_good = native.load_batch(chunk, length=12000)
        assert good == ref_good
        np.testing.assert_array_equal(batch, ref)


def test_prefetch_loader_close_midstream(wav_files):
    # closing with jobs still pending must drain them safely
    ld = native.PrefetchLoader(wav_files * 4, batch_size=3, length=8000,
                               depth=3)
    it = iter(ld)
    next(it)
    ld.close()
