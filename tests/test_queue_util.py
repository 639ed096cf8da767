"""_queue frequency-ratio primitives vs the reference C (goldens + fuzz)."""

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

from audioflux_tpu.mir._queue_util import (cal_range_times, queue_fre2,
                                           queue_fre3)

_REF = os.path.join(os.path.dirname(__file__), "..", ".ref",
                    "libaudioflux.so")

# captured from the reference __queue_fre2/__queue_fre3 (see module doc)
_GOLD2 = [
    (110.0, 220.5, 110.000000, 1, 2),
    (110.0, 331.0, 110.000000, 1, 3),
    (98.0, 147.2, 49.000000, 2, 3),
    (65.4, 261.6, 65.400002, 1, 4),
    (440.0, 442.0, 440.000000, 1, 1),
    (100.0, 373.0, 0.000000, 0, 0),
    (82.4, 207.0, 0.000000, 0, 0),
]
_GOLD3 = [
    (110.0, 220.0, 330.5, 110.000000, 1, 1, 1, 2, 3),
    (98.0, 196.5, 294.0, 98.000000, 1, 1, 1, 2, 3),
    (110.0, 330.0, 550.0, 110.000000, 2, 2, 1, 3, 5),
    (130.8, 196.0, 262.0, 65.400002, 1, 1, 2, 3, 4),
    (100.0, 300.0, 477.0, 0.000000, 0, 0, 0, 0, 0),
]


def test_queue_fre2_goldens():
    for f1, f2, fre, k1, k2 in _GOLD2:
        # float32 inputs, as the C receives them
        f1 = float(np.float32(f1))
        f2 = float(np.float32(f2))
        got = queue_fre2(f1, f2)
        assert (got[1], got[2]) == (k1, k2), (f1, f2, got)
        assert got[0] == pytest.approx(fre, abs=1e-3)


def test_queue_fre3_goldens():
    for f1, f2, f3, fre, s1, s2, k1, k2, k3 in _GOLD3:
        f1, f2, f3 = (float(np.float32(v)) for v in (f1, f2, f3))
        got = queue_fre3(f1, f2, f3)
        assert got[1:] == (s1, s2, k1, k2, k3), (f1, f2, f3, got)
        assert got[0] == pytest.approx(fre, abs=1e-3)


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_util_fuzz_vs_c():
    lib = ctypes.CDLL(_REF)
    lib.__queue_fre2.restype = ctypes.c_float
    lib.__queue_fre2.argtypes = [ctypes.c_float, ctypes.c_float,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.__queue_fre3.restype = ctypes.c_float
    lib.__queue_fre3.argtypes = ([ctypes.c_float] * 3
                                 + [ctypes.POINTER(ctypes.c_int)] * 5)
    lib.util_calRangeTimes.restype = ctypes.c_int
    lib.util_calRangeTimes.argtypes = [ctypes.c_float, ctypes.c_float,
                                       ctypes.POINTER(ctypes.c_int)]
    rng = np.random.default_rng(11)
    for _ in range(600):
        base = float(np.float32(rng.uniform(30, 900)))
        if rng.random() < 0.6:
            vals = [base * int(rng.integers(1, 8)) + rng.normal(0, 2)
                    for _ in range(3)]
        else:
            vals = [rng.uniform(30, 2000) for _ in range(3)]
        f1, f2, f3 = sorted(float(np.float32(abs(v) + 1.0)) for v in vals)
        if f2 - f1 < 1e-3 or f3 - f2 < 1e-3:
            continue
        t = ctypes.c_int(0)
        kc = lib.util_calRangeTimes(f1, f2, ctypes.byref(t))
        assert cal_range_times(f1, f2) == (kc, t.value), (f1, f2)
        a = ctypes.c_int()
        b = ctypes.c_int()
        fc = lib.__queue_fre2(f1, f2, ctypes.byref(a), ctypes.byref(b))
        fp, p1, p2 = queue_fre2(f1, f2)
        assert (p1, p2) == (a.value, b.value), (f1, f2)
        assert fp == pytest.approx(fc, abs=1e-3 * max(fc, 1))
        outs = [ctypes.c_int() for _ in range(5)]
        fc3 = lib.__queue_fre3(f1, f2, f3, *[ctypes.byref(o) for o in outs])
        r = queue_fre3(f1, f2, f3)
        assert r[1:] == tuple(o.value for o in outs), (f1, f2, f3)
        assert r[0] == pytest.approx(fc3, abs=1e-3 * max(fc3, 1))


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_strategies_fuzz_vs_c():
    from audioflux_tpu.mir._queue_util import queue_direct, queue_weak
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.__queue_direct.restype = ctypes.c_float
    lib.__queue_direct.argtypes = [FP, FP, FP, IP, ctypes.c_int,
                                   ctypes.c_float, IP]
    lib.__queue_weak.restype = ctypes.c_float
    lib.__queue_weak.argtypes = [FP, FP, FP, IP, ctypes.c_int,
                                 ctypes.c_float, IP, IP]
    rng = np.random.default_rng(5)
    for _ in range(400):
        n = int(rng.integers(2, 7))
        base = rng.uniform(40, 500)
        if rng.random() < 0.7:
            ks = np.sort(rng.choice(np.arange(1, 10), n, replace=False))
            fre = np.float32(base * ks + rng.normal(0, 1.5, n))
        else:
            fre = np.float32(np.sort(rng.uniform(40, 2000, n)))
        fre = np.sort(fre).astype(np.float32)
        if np.min(np.diff(fre)) < 1:
            continue
        db = np.float32(rng.uniform(-60, -5, n))
        if len(np.unique(db)) < n:
            continue
        h = np.float32(rng.uniform(0, 30, n))
        order = np.argsort(-db, kind="stable")
        idx = np.empty(n, np.int32)
        idx[order] = np.arange(n)
        light = float(rng.uniform(0, 1))
        args = (list(map(float, fre)), list(map(float, db)),
                list(map(float, h)), list(map(int, idx)), n, light, 0)
        v = ctypes.c_int(0)
        fd = lib.__queue_direct(fre.ctypes.data_as(FP),
                                db.ctypes.data_as(FP),
                                h.ctypes.data_as(FP),
                                idx.ctypes.data_as(IP), n, light,
                                ctypes.byref(v))
        assert queue_direct(*args) == pytest.approx(fd, abs=1e-3)
        v = ctypes.c_int(0)
        st = ctypes.c_int(0)
        fw = lib.__queue_weak(fre.ctypes.data_as(FP),
                              db.ctypes.data_as(FP),
                              h.ctypes.data_as(FP),
                              idx.ctypes.data_as(IP), n, light,
                              ctypes.byref(v), ctypes.byref(st))
        assert queue_weak(*args) == pytest.approx(fw, abs=1e-3)


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_fast_fuzz_vs_c():
    from audioflux_tpu.mir._queue_util import queue_fast
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.__queue_fast.restype = ctypes.c_float
    lib.__queue_fast.argtypes = ([FP, FP, FP, IP, ctypes.c_int,
                                  FP, FP, FP, ctypes.c_int,
                                  ctypes.c_float, IP, IP]
                                 + [FP] * 6)
    rng = np.random.default_rng(17)
    PAD = 16
    for _ in range(400):
        n = int(rng.integers(3, 7))
        rn = int(rng.integers(n, 10))
        base = rng.uniform(40, 500)
        if rng.random() < 0.7:
            ks = np.sort(rng.choice(np.arange(1, 10), n, replace=False))
            fre = base * ks + rng.normal(0, 1.5, n)
        else:
            fre = np.sort(rng.uniform(40, 2000, n))
        fre = np.sort(np.float32(fre)).astype(np.float32)
        if np.min(np.diff(fre)) < 1:
            continue
        db = np.float32(rng.uniform(-60, -5, n))
        if len(np.unique(db)) < n:
            continue
        h = np.float32(rng.uniform(0, 30, n))
        order = np.argsort(-db, kind="stable")
        idx = np.empty(n, np.int32)
        idx[order] = np.arange(n)
        fre2 = np.sort(np.float32(np.concatenate(
            [fre, rng.uniform(40, 2000, max(rn - n, 0))]))).astype(np.float32)
        db2 = np.float32(rng.uniform(-60, -5, rn))
        h2 = np.float32(rng.uniform(0, 30, rn))
        light = float(rng.uniform(0, 1))

        def pad(a, dt=np.float32):
            out = np.zeros(PAD, dt)
            out[:len(a)] = a
            return out

        fp_, dp_, hp_ = pad(fre), pad(db), pad(h)
        ip_ = pad(idx, np.int32)
        f2p, d2p, h2p = pad(fre2), pad(db2), pad(h2)
        v = ctypes.c_int(0)
        fmt = ctypes.c_int(0)
        zp = [np.zeros(1, np.float32) for _ in range(6)]
        fc = lib.__queue_fast(
            fp_.ctypes.data_as(FP), dp_.ctypes.data_as(FP),
            hp_.ctypes.data_as(FP), ip_.ctypes.data_as(IP), n,
            f2p.ctypes.data_as(FP), d2p.ctypes.data_as(FP),
            h2p.ctypes.data_as(FP), rn, light,
            ctypes.byref(v), ctypes.byref(fmt),
            *[a.ctypes.data_as(FP) for a in zp])
        pp = queue_fast(list(map(float, fp_)), list(map(float, dp_)),
                        list(map(float, hp_)), list(map(int, ip_)), n,
                        list(map(float, f2p)), list(map(float, d2p)),
                        list(map(float, h2p)), rn, light, 0)
        assert pp == pytest.approx(fc, abs=1e-3 * max(abs(fc), 1))


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_slide_fuzz_vs_c():
    from audioflux_tpu.mir._queue_util import queue_slide
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.__queue_slide.restype = ctypes.c_float
    lib.__queue_slide.argtypes = [FP, FP, FP, IP, ctypes.c_int,
                                  ctypes.c_float, IP, IP]
    rng = np.random.default_rng(29)
    PAD = 20
    for _ in range(400):
        n = int(rng.integers(3, 9))
        base = rng.uniform(40, 500)
        r = rng.random()
        if r < 0.5:
            ks = np.sort(rng.choice(np.arange(1, 12), n, replace=False))
            fre = base * ks + rng.normal(0, 1.5, n)
        elif r < 0.75:
            b2 = rng.uniform(40, 500)
            k1s = rng.choice(np.arange(1, 7), n // 2, replace=False)
            k2s = rng.choice(np.arange(1, 7), n - n // 2, replace=False)
            fre = np.concatenate([base * k1s, b2 * k2s]) + rng.normal(
                0, 1.5, n)
        else:
            fre = rng.uniform(40, 2000, n)
        fre = np.sort(np.float32(np.abs(fre) + 1)).astype(np.float32)
        if np.min(np.diff(fre)) < 1.5:
            continue
        db = np.float32(rng.uniform(-60, -5, n))
        if len(np.unique(db)) < n:
            continue
        h = np.float32(rng.uniform(0, 30, n))
        order = np.argsort(-db, kind="stable")
        idx = np.empty(n, np.int32)
        idx[order] = np.arange(n)
        light = float(rng.uniform(0, 1.05))

        def pad(a, dt=np.float32):
            out = np.zeros(PAD, dt)
            out[:len(a)] = a
            return out

        fp_, dp_, hp_, ip_ = pad(fre), pad(db), pad(h), pad(idx, np.int32)
        v = ctypes.c_int(0)
        st = ctypes.c_int(0)
        fc = lib.__queue_slide(
            fp_.ctypes.data_as(FP), dp_.ctypes.data_as(FP),
            hp_.ctypes.data_as(FP), ip_.ctypes.data_as(IP), n, light,
            ctypes.byref(v), ctypes.byref(st))
        pp, pst = queue_slide(list(map(float, fp_)), list(map(float, dp_)),
                              list(map(float, hp_)), list(map(int, ip_)),
                              n, light, 0)
        assert pp == pytest.approx(fc, abs=1e-3 * max(abs(fc), 1))
        if fc:
            assert pst == st.value


def test_trist_dispatch_smoke():
    from audioflux_tpu.mir._queue_util import trist_dispatch
    # a clean 110 Hz stack resolves via one of the strategies
    fre = [110.0, 220.3, 330.1, 441.0]
    db = [-20.0, -12.0, -25.0, -30.0]
    h = [20.0, 22.0, 15.0, 10.0]
    flag, f0 = trist_dispatch(fre, db, h, 4, 0.5)
    assert flag in (3, 4, 5)
    assert f0 == pytest.approx(110.0, abs=2)


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_standard_fuzz_vs_c():
    from audioflux_tpu.mir._queue_util import queue_standard
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.__queue_standard.restype = ctypes.c_float
    lib.__queue_standard.argtypes = ([FP, FP, FP, IP, ctypes.c_int,
                                      FP, FP, FP, ctypes.c_int,
                                      FP, FP, FP, ctypes.c_int,
                                      ctypes.c_float, IP, IP] + [FP] * 6)
    rng = np.random.default_rng(37)
    PAD = 24
    for _ in range(300):
        rn = int(rng.integers(4, 18))
        n = int(rng.integers(2, min(rn, 7)))
        base = rng.uniform(40, 500)
        if rng.random() < 0.6:
            ks = np.sort(rng.choice(np.arange(1, 20), rn, replace=False))
            fre3 = base * ks + rng.normal(0, 1.5, rn)
        else:
            fre3 = rng.uniform(40, 2500, rn)
        fre3 = np.sort(np.float32(np.abs(fre3) + 1)).astype(np.float32)
        if np.min(np.diff(fre3)) < 1.5:
            continue
        db3 = np.float32(rng.uniform(-60, -5, rn))
        if len(np.unique(db3)) < rn:
            continue
        h3 = np.float32(rng.uniform(0, 30, rn))
        sel = np.sort(rng.choice(rn, n, replace=False))
        fre1, db1, h1 = fre3[sel], db3[sel], h3[sel]
        order = np.argsort(-db1, kind="stable")
        idx1 = np.empty(n, np.int32)
        idx1[order] = np.arange(n)
        light = float(rng.uniform(0, 1.05))

        def pad(a, dt=np.float32):
            out = np.zeros(PAD, dt)
            out[:len(a)] = a
            return out

        f1p, d1p, h1p = pad(fre1), pad(db1), pad(h1)
        i1p = pad(idx1, np.int32)
        f3p, d3p, h3p = pad(fre3), pad(db3), pad(h3)
        v = ctypes.c_int(0)
        fmt = ctypes.c_int(0)
        zp = [np.zeros(1, np.float32) for _ in range(6)]
        fc = lib.__queue_standard(
            f1p.ctypes.data_as(FP), d1p.ctypes.data_as(FP),
            h1p.ctypes.data_as(FP), i1p.ctypes.data_as(IP), n,
            f1p.ctypes.data_as(FP), d1p.ctypes.data_as(FP),
            h1p.ctypes.data_as(FP), n,
            f3p.ctypes.data_as(FP), d3p.ctypes.data_as(FP),
            h3p.ctypes.data_as(FP), rn, light,
            ctypes.byref(v), ctypes.byref(fmt),
            *[a.ctypes.data_as(FP) for a in zp])
        pp = queue_standard(
            list(map(float, f1p)), list(map(float, d1p)),
            list(map(float, h1p)), list(map(int, i1p)), n,
            list(map(float, f1p)), list(map(float, d1p)),
            list(map(float, h1p)), n,
            list(map(float, f3p)), list(map(float, d3p)),
            list(map(float, h3p)), rn, light, 0)
        assert pp == pytest.approx(fc, abs=1e-3 * max(abs(fc), 1))


def test_trist3_resolve_smoke():
    from audioflux_tpu.mir._queue_util import trist3_resolve
    fre = [110.0, 220.3, 330.1, 441.0, 551.2]
    db = [-20.0, -12.0, -25.0, -30.0, -33.0]
    h = [20.0, 22.0, 15.0, 10.0, 8.0]
    flag, f0 = trist3_resolve(fre, db, h, 5, fre[:4], db[:4], h[:4], 4,
                              fre[:3], db[:3], h[:3], 3, 0.5)
    assert flag in (1, 2, 3, 4, 5, 6)
    assert f0 == pytest.approx(110.0, abs=2)


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_bear_count_multi_fuzz_vs_c():
    from audioflux_tpu.mir._queue_util import (queue_bear, queue_count,
                                               queue_multi)
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.__queue_bear.restype = ctypes.c_int
    lib.__queue_bear.argtypes = [FP, FP, FP, ctypes.c_int, ctypes.c_float,
                                 ctypes.c_float, IP]
    lib.__queue_count.restype = ctypes.c_int
    lib.__queue_count.argtypes = [FP, FP, FP, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_float, ctypes.c_float,
                                  ctypes.c_int]
    lib.__queue_multi.restype = ctypes.c_float
    lib.__queue_multi.argtypes = [FP, FP, FP, ctypes.c_int] + [
        ctypes.c_int] * 4
    rng = np.random.default_rng(43)
    PAD = 24
    for _ in range(300):
        n = int(rng.integers(5, 16))
        base = rng.uniform(40, 400)
        if rng.random() < 0.7:
            ks = np.sort(rng.choice(np.arange(1, 20), n, replace=False))
            fre = base * ks + rng.normal(0, 1.5, n)
        else:
            fre = rng.uniform(40, 2500, n)
        fre = np.sort(np.float32(np.abs(fre) + 1)).astype(np.float32)
        if np.min(np.diff(fre)) < 1.5:
            continue
        db = np.float32(rng.uniform(-60, -5, n))
        h = np.float32(rng.uniform(0, 30, n))

        def pad(a):
            out = np.zeros(PAD, np.float32)
            out[:len(a)] = a
            return out

        fp_, dp_, hp_ = pad(fre), pad(db), pad(h)
        args = (list(map(float, fp_)), list(map(float, dp_)),
                list(map(float, hp_)), n)
        tgt = float(base * rng.integers(1, 3))
        mn = float(rng.uniform(0, 300))
        idx = ctypes.c_int(0)
        rb = lib.__queue_bear(fp_.ctypes.data_as(FP),
                              dp_.ctypes.data_as(FP),
                              hp_.ctypes.data_as(FP), n, mn, tgt,
                              ctypes.byref(idx))
        pb, pidx = queue_bear(*args, mn, tgt, 0)
        assert rb == pb and (not rb or idx.value == pidx)
        st = int(rng.integers(0, 3))
        rc = lib.__queue_count(fp_.ctypes.data_as(FP),
                               dp_.ctypes.data_as(FP),
                               hp_.ctypes.data_as(FP), n, 0, mn, tgt, st)
        assert queue_count(*args, 0, mn, tgt, st) == rc
        num = int(rng.integers(1, 4))
        sub = int(rng.integers(0, 2))
        rm = lib.__queue_multi(fp_.ctypes.data_as(FP),
                               dp_.ctypes.data_as(FP),
                               hp_.ctypes.data_as(FP), n, num, sub, 2, 0)
        assert queue_multi(*args, num, sub, 2, 0) == pytest.approx(
            rm, abs=1e-3 * max(abs(rm), 1))


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_queue_cut_fuzz_vs_c():
    from audioflux_tpu.mir._queue_cut import queue_cut
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.__queue_cut.restype = ctypes.c_float
    lib.__queue_cut.argtypes = ([FP, FP, FP, IP, ctypes.c_int,
                                 FP, FP, FP, ctypes.c_int,
                                 FP, FP, FP, ctypes.c_int,
                                 ctypes.c_float, IP, IP] + [FP] * 6)
    strings = [82.4, 98.0, 110.0, 146.8, 196.0, 246.9, 329.6, 100.0]
    rng = np.random.default_rng(59)
    PAD = 24
    done = 0
    while done < 300:
        base = float(np.float32(strings[int(rng.integers(0, len(strings)))]
                                + rng.normal(0, 2)))
        rn = int(rng.integers(4, 13))
        lo = 1 if rng.random() < 0.3 else 2
        ks = np.sort(rng.choice(np.arange(lo, lo + 13), rn, replace=False))
        fre3 = np.sort(np.float32(np.abs(
            base * ks + rng.normal(0, 1.2, rn)) + 1)).astype(np.float32)
        if len(fre3) < 4 or np.min(np.diff(fre3)) < 1.5:
            continue
        rn = len(fre3)
        db3 = np.float32(-10 - 2.0 * np.arange(rn) + rng.normal(0, 6, rn))
        if rng.random() < 0.5:
            db3[int(rng.integers(0, min(4, rn)))] += rng.uniform(10, 25)
        if len(np.unique(db3)) < rn:
            continue
        h3 = np.float32(np.abs(rng.normal(15, 8, rn)))
        n2 = int(rng.integers(4, min(rn, 9) + 1))
        n = int(rng.integers(4, n2 + 1))
        sel2 = np.sort(rng.choice(rn, n2, replace=False))
        f2a, d2a, h2a = fre3[sel2], db3[sel2], h3[sel2]
        sel = np.sort(rng.choice(n2, n, replace=False))
        f1a, d1a, h1a = f2a[sel], d2a[sel], h2a[sel]
        order = np.argsort(-d1a, kind="stable")
        idx1 = np.empty(n, np.int32)
        idx1[order] = np.arange(n)
        light = float(rng.choice([0.2, 0.985, 1.0]))
        done += 1

        def pad(a, dt=np.float32):
            # one zero sentinel BEFORE the data: the C's cutValid reads
            # _dbArr[i-1] at i=0
            out = np.zeros(PAD + 1, dt)
            out[1:1 + len(a)] = a
            return out

        f1p, d1p, h1p = pad(f1a), pad(d1a), pad(h1a)
        i1p = pad(idx1, np.int32)
        f2p, d2p, h2p = pad(f2a), pad(d2a), pad(h2a)
        f3p, d3p, h3p = pad(fre3), pad(db3), pad(h3)
        # python FIRST: the C sorts the caller's arrays in place
        pp = queue_cut(
            list(map(float, f1p[1:])), list(map(float, d1p[1:])),
            list(map(float, h1p[1:])), list(map(int, i1p[1:])), n,
            list(map(float, f2p[1:])), list(map(float, d2p[1:])),
            list(map(float, h2p[1:])), n2,
            list(map(float, f3p[1:])), list(map(float, d3p[1:])),
            list(map(float, h3p[1:])), rn, light, 0)

        def ptr(a):
            return a[1:].ctypes.data_as(FP)

        v = ctypes.c_int(0)
        fmt = ctypes.c_int(0)
        zp = [np.zeros(1, np.float32) for _ in range(6)]
        fc = lib.__queue_cut(
            ptr(f1p), ptr(d1p), ptr(h1p), i1p[1:].ctypes.data_as(IP), n,
            ptr(f2p), ptr(d2p), ptr(h2p), n2,
            ptr(f3p), ptr(d3p), ptr(h3p), rn, light,
            ctypes.byref(v), ctypes.byref(fmt),
            *[a.ctypes.data_as(FP) for a in zp])
        assert pp == pytest.approx(fc, abs=1e-3 * max(abs(fc), 1))


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_trist3_short_length_fuzz_vs_c():
    """Exact-length lists at lengths 1-3: the production call shape.

    The earlier per-strategy rigs pass PAD-zero-extended Python lists, so
    they can never catch reads past the logical end (the C reads calloc'd
    zeros there; a faithful port must model them, not crash).  This rig
    drives the full trist3 cascade with exact-length lists, the shape
    ``_ffp_chain`` uses, over the short lengths the other rigs skip.
    """
    from audioflux_tpu.mir._queue_util import trist3_resolve
    lib = ctypes.CDLL(_REF)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int)
    lib.trist3.restype = ctypes.c_int
    lib.trist3.argtypes = ([FP, FP, FP, ctypes.c_int] * 3
                           + [ctypes.c_float, FP, IP] + [FP] * 6)
    rng = np.random.default_rng(1234)
    PAD = 24
    cases = 0
    for _ in range(2500):
        n1 = int(rng.integers(1, 8))
        n2 = int(rng.integers(0, n1 + 1))
        n3 = int(rng.integers(0, max(n2, 1) + 1))
        r = rng.random()
        if r < 0.4:
            base = rng.uniform(40, 500)
            ks = np.sort(rng.choice(np.arange(1, 12), n1, replace=False))
            fre1 = np.float32(base * ks + rng.normal(0, 1.5, n1))
        elif r < 0.6:
            # the 190-204 Hz "3rd string" traps read past short arrays
            fre1 = np.float32(rng.uniform(185, 210, n1))
        else:
            fre1 = np.float32(rng.uniform(40, 2000, n1))
        fre1 = np.sort(np.abs(fre1) + 1).astype(np.float32)
        if n1 > 1 and np.min(np.diff(fre1)) < 1.5:
            continue
        db1 = np.float32(rng.uniform(-60, 0, n1))
        if len(np.unique(db1)) < n1:
            continue
        h1 = np.float32(rng.uniform(0, 30, n1))
        s2 = np.sort(rng.choice(n1, n2, replace=False))
        s3 = (np.sort(rng.choice(s2, n3, replace=False))
              if n2 > 0 else np.array([], int))
        n3 = len(s3)
        fre2, db2, h2 = fre1[s2], db1[s2], h1[s2]
        fre3, db3, h3 = fre1[s3], db1[s3], h1[s3]
        light = float(rng.uniform(0, 1.05))

        def pad(a, dt=np.float32):
            out = np.zeros(PAD, dt)
            out[:len(a)] = np.asarray(a, dt)
            return out

        f1p, d1p, h1p = pad(fre1), pad(db1), pad(h1)
        f2p, d2p, h2p = pad(fre2), pad(db2), pad(h2)
        f3p, d3p, h3p = pad(fre3), pad(db3), pad(h3)
        out = ctypes.c_float(0)
        fmt = ctypes.c_int(0)
        zp = [np.zeros(4, np.float32) for _ in range(6)]
        flag_c = lib.trist3(
            f1p.ctypes.data_as(FP), d1p.ctypes.data_as(FP),
            h1p.ctypes.data_as(FP), n1,
            f2p.ctypes.data_as(FP), d2p.ctypes.data_as(FP),
            h2p.ctypes.data_as(FP), n2,
            f3p.ctypes.data_as(FP), d3p.ctypes.data_as(FP),
            h3p.ctypes.data_as(FP), n3,
            light, ctypes.byref(out), ctypes.byref(fmt),
            *[a.ctypes.data_as(FP) for a in zp])
        flag_p, fre_p = trist3_resolve(
            list(map(float, fre1)), list(map(float, db1)),
            list(map(float, h1)), n1,
            list(map(float, fre2)), list(map(float, db2)),
            list(map(float, h2)), n2,
            list(map(float, fre3)), list(map(float, db3)),
            list(map(float, h3)), n3, light)
        cases += 1
        fc = out.value
        assert fre_p == pytest.approx(fc, abs=1e-3 * max(abs(fc), 1)), \
            (n1, n2, n3, list(fre1), list(db1), list(h1), light)
        if fc:
            assert flag_p == flag_c
    assert cases > 1500


def test_queue_fast_length_one_no_oob():
    """Regression: length-1 fall-through reads dbArr[1] past the end
    (_queue.c:5503 reads a calloc'd zero; the port crashed here)."""
    from audioflux_tpu.mir._queue_util import queue_fast
    # the trap needs db[0] - dbArr[1] > 18 with dbArr[1] the calloc'd 0,
    # so only a positive-dB peak fires it
    fre = queue_fast([196.0], [25.0], [20.0], [0], 1)
    assert fre == pytest.approx(196.0)
    # typical negative dB: the read must yield 0 (not crash), no match
    fre = queue_fast([196.0], [-5.0], [20.0], [0], 1)
    assert fre == 0.0


def test_queue_cut_fixed_count_sorts_short_length():
    """Regression: __queue_cut's 'fre asc 2/3' sorts are UNclamped in the
    C — at length 2 they pull a calloc'd zero into the logical view and
    the function falls through (oracle-verified; see
    test_trist3_short_length_fuzz_vs_c)."""
    from audioflux_tpu.mir._queue_cut import queue_cut
    fre3 = [190.77855, 200.34282]
    db3 = [-22.98284, -54.908104]
    h3 = [1.0498627, 16.811642]
    fre1 = [187.95212, 190.77855, 200.34282]
    db1 = [-19.864925, -22.98284, -54.908104]
    h1 = [24.562204, 1.0498627, 16.811642]
    fre = queue_cut(fre3, db3, h3, [0, 1], 2, fre1, db1, h1, 3,
                    fre1, db1, h1, 3, 0.9179094100870372, 0)
    assert fre == 0.0
    # caller-visible mutation matches the C: zero dragged to the front
    assert fre3[0] == 0.0 and fre3[1] == pytest.approx(190.77855)
