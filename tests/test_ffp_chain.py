"""PitchFFP end-to-end parity with the C pitchFFPObj (frame-exact)."""

import ctypes
import os

# The reference .so corrupts the host process heap across calls (latent
# overreads; see CLAUDE.md) — symptoms surface much later as segfaults in
# unrelated XLA compiles.  These C-oracle tests therefore run inside an
# isolated child pytest (tests/test_c_oracle.py); in the main process
# they are skipped.
import os as _os
import pytest as _pytest
if _os.environ.get("AF_C_ORACLE") != "1":
    pytestmark = _pytest.mark.skip(
        reason="runs isolated via test_c_oracle.py (C heap corruption)")


import numpy as np
import pytest

import audioflux_tpu as af

_REF = os.path.join(os.path.dirname(__file__), "..", ".ref",
                    "libaudioflux.so")


def _signals():
    sr = 32000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(3)
    out = []
    for f0, amps in [(110.3, [0.4, 0.3, 0.2, 0.12, 0.08, 0.05]),
                     (196.4, [0.35, 0.28, 0.15, 0.1]),
                     (82.6, [0.3, 0.35, 0.25, 0.15, 0.1, 0.06]),
                     (246.5, [0.4, 0.25, 0.1, 0.05]),
                     (329.9, [0.45, 0.2, 0.08])]:
        x = np.zeros_like(t, np.float32)
        for k, a in enumerate(amps, start=1):
            x += a * np.sin(2 * np.pi * f0 * k * t
                            + rng.uniform(0, 6)).astype(np.float32)
        x *= np.exp(-t * 1.8).astype(np.float32)
        x += 0.002 * rng.standard_normal(len(t)).astype(np.float32)
        out.append((f0, x.astype(np.float32)))
    return out


def test_pitch_ffp_tracks_fundamental():
    obj = af.PitchFFP(samplate=32000, radix2_exp=12, slide_length=1024)
    for f0, x in _signals():
        fre, db = obj.pitch(x)
        mid = fre[2:20]
        good = mid[np.abs(mid - f0) < 3]
        assert len(good) >= len(mid) * 0.7, (f0, mid.tolist())


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_pitch_ffp_frame_exact_vs_c():
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    obj = af.PitchFFP(samplate=32000, radix2_exp=12, slide_length=1024)
    for f0, x in _signals():
        cobj = ctypes.c_void_p()
        # match the Python-wrapper defaults the PitchFFP class mirrors
        lib.pitchFFPObj_new(
            ctypes.byref(cobj), ctypes.byref(ctypes.c_int(32000)),
            ctypes.byref(ctypes.c_float(32.0)),
            ctypes.byref(ctypes.c_float(2000.0)),
            ctypes.byref(ctypes.c_int(12)),
            ctypes.byref(ctypes.c_int(1024)),
            ctypes.byref(ctypes.c_int(2)), None)
        T = lib.pitchFFPObj_calTimeLength(cobj, ctypes.c_int(len(x)))
        fre_c = np.zeros(T + 8, np.float32)
        db_c = np.zeros(T + 8, np.float32)
        lib.pitchFFPObj_pitch(cobj, x.ctypes.data_as(FP),
                              ctypes.c_int(len(x)),
                              fre_c.ctypes.data_as(FP),
                              db_c.ctypes.data_as(FP))
        c4 = FP()
        d4 = FP()
        h4 = FP()
        l4 = IP()
        mlen = lib.pitchFFPObj_getCutData(cobj, ctypes.byref(c4),
                                          ctypes.byref(d4),
                                          ctypes.byref(h4),
                                          ctypes.byref(l4))
        cut_c = np.ctypeslib.as_array(c4, (T, mlen)).copy()
        fre_p, db_p = obj.pitch(x)
        assert np.max(np.abs(fre_c[:T] - fre_p[:T])) <= 0.05, f0
        assert np.max(np.abs(db_c[:T] - db_p[:T])) <= 0.05, f0
        # cut sets match as sets (the C rows get reordered in place by
        # the trist3 strategies after fastCut)
        for i in range(T):
            r = obj.get_cut_data()[i]
            assert np.max(np.abs(np.sort(cut_c[i][:4])
                                 - np.sort(np.float32(r.fre[:4])))) <= 0.05


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_yin_trough_data_vs_c():
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    sr = 32000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(5)
    x = (0.4 * np.sin(2 * np.pi * 146.9 * t)
         + 0.2 * np.sin(2 * np.pi * 293.8 * t)
         + 0.1 * np.sin(2 * np.pi * 440.7 * t)
         + 0.004 * rng.standard_normal(len(t))).astype(np.float32)
    obj = ctypes.c_void_p()
    lib.pitchYINObj_new(ctypes.byref(obj), ctypes.byref(ctypes.c_int(sr)),
                        None, None, ctypes.byref(ctypes.c_int(12)),
                        ctypes.byref(ctypes.c_int(1024)),
                        ctypes.byref(ctypes.c_int(2048)), None)
    T = lib.pitchYINObj_calTimeLength(obj, ctypes.c_int(len(x)))
    fre = np.zeros(T + 4, np.float32)
    v1 = np.zeros(T + 4, np.float32)
    v2 = np.zeros(T + 4, np.float32)
    lib.pitchYINObj_pitch(obj, x.ctypes.data_as(FP), ctypes.c_int(len(x)),
                          fre.ctypes.data_as(FP), v1.ctypes.data_as(FP),
                          v2.ctypes.data_as(FP))
    mf = FP()
    mt = FP()
    lp = IP()
    mlen = lib.pitchYINObj_getTroughData(obj, ctypes.byref(mf),
                                         ctypes.byref(mt), ctypes.byref(lp))
    mfre = np.ctypeslib.as_array(mf, (T, mlen)).copy()
    mtr = np.ctypeslib.as_array(mt, (T, mlen)).copy()
    lens = np.ctypeslib.as_array(lp, (T,)).copy()
    y = af.PitchYIN(samplate=sr, radix2_exp=12, slide_length=1024)
    fre_rows, trough_rows, lens_p = y.get_trough_data(x)
    for i in range(T):
        assert lens[i] == lens_p[i], i
        if lens[i]:
            assert np.max(np.abs(mfre[i][:lens[i]] - fre_rows[i])) <= 0.05
            assert np.max(np.abs(mtr[i][:lens[i]]
                                 - trough_rows[i])) <= 1e-4
