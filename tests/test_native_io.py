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
