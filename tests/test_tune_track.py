"""TuneTrack: stable tone tracking on a two-note sequence."""

import numpy as np

from audioflux_tpu.track import TuneTrack


def _pluck(f0, seg, sr, rng):
    t = np.arange(seg) / sr
    s = np.zeros(seg)
    for k, a in enumerate([0.35, 0.28, 0.18, 0.1, 0.06, 0.04], start=1):
        s += a * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
    return s * np.exp(-t * 2.0)


def test_tune_track_two_notes():
    # harmonically-rich damped plucks: the C state machine (now ported
    # exactly) needs harmonic structure for entry; pure un-damped sines
    # are deliberately held (see test_tune_track_frame_exact_vs_c)
    sr = 32000
    rng = np.random.default_rng(7)
    a = _pluck(220.0, sr, sr, rng)
    b = _pluck(329.6, sr, sr, rng)
    x = np.concatenate([a, b]).astype(np.float32)
    x += 0.002 * rng.standard_normal(len(x)).astype(np.float32)
    tt = TuneTrack(samplate=sr, radix2_exp=12, slide_length=1024)
    fre = tt.tune(x)
    T = len(fre)
    first = fre[4:T // 2 - 4]
    second = fre[T // 2 + 4:T - 4]
    first = first[first > 0]
    second = second[second > 0]
    assert len(first) and abs(np.median(first) - 220) < 3
    assert len(second) and abs(np.median(second) - 329.6) < 4


def test_tune_track_streaming_clear():
    sr = 32000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    tt = TuneTrack(samplate=sr, radix2_exp=12, slide_length=1024)
    f1 = tt.tune(x)
    tt.clear()
    f2 = tt.tune(x)
    np.testing.assert_allclose(f1, f2)


def test_tune_track_frame_exact_vs_c(tmp_path):
    """Oracle comparison vs the C tuneTrackObj.

    The C library corrupts its allocator across calls in one process
    (latent heap overreads; see CLAUDE.md), so the ctypes drive runs in
    a throwaway subprocess — in-process it segfaults depending on what
    ran before in the suite.
    """
    import os
    import subprocess
    import sys

    ref = os.path.join(os.path.dirname(__file__), "..", ".ref",
                       "libaudioflux.so")
    if not os.path.exists(ref):
        import pytest
        pytest.skip("reference oracle not built")

    sr = 32000
    rng = np.random.default_rng(17)
    notes = [82.41, 110.0, 146.83, 196.0, 246.94, 329.63]
    seg = sr // 2
    x = np.zeros(seg * len(notes), np.float32)
    for n_i, f0 in enumerate(notes):
        tt_ = np.arange(seg) / sr
        s = np.zeros(seg)
        for k, a in enumerate([0.3, 0.3, 0.2, 0.12, 0.07, 0.05], start=1):
            s += a * np.sin(2 * np.pi * f0 * k * tt_ + rng.uniform(0, 6))
        s *= np.exp(-tt_ * 1.5)
        x[n_i * seg:(n_i + 1) * seg] = s
    x += 0.0025 * rng.standard_normal(len(x)).astype(np.float32)
    x = x.astype(np.float32)

    xp = tmp_path / "x.npy"
    outp = tmp_path / "fre_c.npy"
    np.save(xp, x)
    worker = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({str(ref)!r})
FP = ctypes.POINTER(ctypes.c_float)
x = np.load({str(xp)!r})
obj = ctypes.c_void_p()
lib.tuneTrackObj_new(ctypes.byref(obj), ctypes.byref(ctypes.c_int(32000)),
                     None, None, ctypes.byref(ctypes.c_int(12)),
                     ctypes.byref(ctypes.c_int(1024)), None)
T = lib.tuneTrackObj_calTimeLength(obj, ctypes.c_int(len(x)))
fre_c = np.zeros(T + 8, np.float32)
lib.tuneTrackObj_tune(obj, x.ctypes.data_as(FP), ctypes.c_int(len(x)),
                      fre_c.ctypes.data_as(FP))
np.save({str(outp)!r}, fre_c[:T])
"""
    r = subprocess.run([sys.executable, "-c", worker], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1000:]
    fre_c = np.load(outp)
    T = len(fre_c)
    tk = TuneTrack(samplate=sr, radix2_exp=12, slide_length=1024)
    fre_p = tk.tune(x)
    assert np.max(np.abs(fre_c - fre_p[:T])) <= 0.05
