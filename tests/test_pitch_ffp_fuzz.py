"""Randomized end-to-end PitchFFP frame-exactness vs the C oracle.

The golden test (test_pitch_ffp.py) pins one harmonic fixture; this rig
drives BOTH implementations over randomized signal classes — harmonic
stacks, noise, chirps, silence-gapped tones, two-note mixtures — and
asserts frame-exact agreement of (fre, db).  The C runs in a throwaway
subprocess (its allocator corrupts across calls; see CLAUDE.md).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from audioflux_tpu.mir.pitch_ffp import PitchFFP

_REF = os.path.join(os.path.dirname(__file__), "..", ".ref",
                    "libaudioflux.so")

SR = 32000


def _harmonic(rng, n, f0, decay=1.5):
    t = np.arange(n) / SR
    s = np.zeros(n)
    for k, a in enumerate([0.3, 0.3, 0.2, 0.12, 0.07, 0.05], start=1):
        s += a * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
    return (s * np.exp(-t * decay)).astype(np.float32)


def _make_signals():
    rng = np.random.default_rng(23)
    n = SR  # 1 s -> 29 frames at 4096/1024
    sigs = []
    for f0 in (82.41, 110.0, 196.0, 329.63, 440.0):
        sigs.append(_harmonic(rng, n, f0))
    sigs.append(0.1 * rng.standard_normal(n).astype(np.float32))
    t = np.arange(n) / SR
    sigs.append(np.sin(2 * np.pi * (100 + 2000 * t) * t).astype(np.float32))
    gap = _harmonic(rng, n, 146.83)
    gap[n // 3:2 * n // 3] = 0
    sigs.append(gap)
    two = _harmonic(rng, n, 110.0) + 0.6 * _harmonic(rng, n, 164.81)
    sigs.append(two.astype(np.float32))
    mix = _harmonic(rng, n, 246.94) + 0.05 * rng.standard_normal(n)
    sigs.append(mix.astype(np.float32))
    return sigs


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_pitch_ffp_frame_exact_fuzz(tmp_path):
    sigs = _make_signals()
    x = np.stack(sigs)
    xp = tmp_path / "x.npy"
    outp = tmp_path / "out.npy"
    np.save(xp, x)
    worker = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({str(_REF)!r})
FP = ctypes.POINTER(ctypes.c_float)
IP = ctypes.POINTER(ctypes.c_int)
xs = np.load({str(xp)!r})
outs = []
for x in xs:
    obj = ctypes.c_void_p()
    lib.pitchFFPObj_new(ctypes.byref(obj), ctypes.byref(ctypes.c_int(32000)),
                        ctypes.byref(ctypes.c_float(32.0)),
                        ctypes.byref(ctypes.c_float(2000.0)),
                        ctypes.byref(ctypes.c_int(12)),
                        ctypes.byref(ctypes.c_int(1024)), None, None)
    T = lib.pitchFFPObj_calTimeLength(obj, ctypes.c_int(len(x)))
    fre = np.zeros(T + 8, np.float32)
    db = np.zeros(T + 8, np.float32)
    lib.pitchFFPObj_pitch(obj, x.astype(np.float32).ctypes.data_as(FP),
                          ctypes.c_int(len(x)),
                          fre.ctypes.data_as(FP), db.ctypes.data_as(FP))
    outs.append(np.stack([fre[:T], db[:T]]))
np.save({str(outp)!r}, np.stack(outs))
"""
    r = subprocess.run([sys.executable, "-c", worker], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1000:]
    ref = np.load(outp)
    for i, x in enumerate(sigs):
        p = PitchFFP(samplate=SR, radix2_exp=12, slide_length=1024)
        fre, db = p.pitch(x)
        T = ref.shape[-1]
        np.testing.assert_allclose(
            np.asarray(fre)[:T], ref[i, 0], atol=1e-3,
            err_msg=f"signal {i}: fre mismatch")
        # db: frame-exact wherever any real signal exists.  At the window
        # leakage noise floor (~-98 dB) the XLA rfft and the C radix-2 FFT
        # differ in the last ulps, flipping WHICH dust bin is a local max;
        # the candidate (and hence the top-peak dB report) is then
        # implementation noise, so only require both to be at the floor.
        db = np.asarray(db)[:T]
        real = ref[i, 1] > -90.0
        np.testing.assert_allclose(
            db[real], ref[i, 1][real], atol=1e-3,
            err_msg=f"signal {i}: db mismatch")
        floor = ~real
        assert np.all((db[floor] < -90.0) | (db[floor] == 0.0)), \
            f"signal {i}: non-floor db where C is at the floor"
