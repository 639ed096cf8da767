"""TuneTrack: stable tone tracking on a two-note sequence."""

import numpy as np

from audioflux_tpu.track import TuneTrack


def test_tune_track_two_notes():
    sr = 32000
    t1 = np.arange(sr) / sr
    a = 0.5 * np.sin(2 * np.pi * 220 * t1)
    b = 0.5 * np.sin(2 * np.pi * 330 * t1)
    x = np.concatenate([a, b]).astype(np.float32)
    tt = TuneTrack(samplate=sr, radix2_exp=12, slide_length=1024)
    fre = tt.tune(x)
    T = len(fre)
    first = fre[4:T // 2 - 4]
    second = fre[T // 2 + 4:T - 4]
    first = first[first > 0]
    second = second[second > 0]
    assert len(first) and abs(np.median(first) - 220) < 3
    assert len(second) and abs(np.median(second) - 330) < 4


def test_tune_track_streaming_clear():
    sr = 32000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    tt = TuneTrack(samplate=sr, radix2_exp=12, slide_length=1024)
    f1 = tt.tune(x)
    tt.clear()
    f2 = tt.tune(x)
    np.testing.assert_allclose(f1, f2)
