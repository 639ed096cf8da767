"""Cross-call ``is_continue`` streaming (tail carry) vs the C objects.

The reference exposes ``is_continue`` on SpectrogramBase, CQTBase, and
resample; the carry itself lives in stftObj (stft_algorithm.c:474-600)
and cqtObj (cqt_algorithm.c:346-430).  The C oracle runs in throwaway
subprocesses (its allocator corrupts across calls; see CLAUDE.md).
NOTE: the reference *wrapper* segfaults driving SpectrogramBase with
is_continue=1 (its output buffer sizing ignores the carried tail), so
the oracle here drives the C objects directly via ctypes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import audioflux_tpu as af
from audioflux_tpu.transforms.stft import STFT, TailCarry

_REF = os.path.join(os.path.dirname(__file__), "..", ".ref",
                    "libaudioflux.so")

_rng = np.random.default_rng(11)
X = (_rng.standard_normal(20000) * 0.3).astype(np.float32)

STFT_CONFIGS = [
    (11, 512, [5000, 600, 7400, 7000]),    # slide < fft
    (9, 1024, [3000, 400, 9000, 7600]),    # slide > fft: NEGATIVE tail
    (11, 2048, [1000, 500, 400, 18100]),   # slide == fft, short feeds
]


def test_tail_carry_negative_tail():
    """slide > fft: the carry is negative — the next chunk's first
    ``-tail`` samples are skipped (the C's tailDataLength<0 branch)."""
    tc = TailCarry(fft_length=512, slide_length=1024)
    buf = tc.feed(np.arange(3000, dtype=np.float32))
    assert buf is not None
    assert tc.tail_len == (3000 - 512) % 1024 + (512 - 1024) == -72
    buf2 = tc.feed(np.arange(3000, 6000, dtype=np.float32))
    # skipped exactly 72 samples of the second chunk
    assert buf2[0] == 3072.0 and len(buf2) == 3000 - 72


def test_tail_carry_accumulates_short_feeds():
    tc = TailCarry(fft_length=2048, slide_length=2048)
    assert tc.feed(X[:1000]) is None
    assert tc.cal_time_length(0) == 0
    assert tc.feed(X[1000:1500]) is None
    buf = tc.feed(X[1500:4096])
    assert buf is not None
    np.testing.assert_array_equal(buf[:4096], X[:4096])


def test_spectrogram_continue_equals_full_prefix():
    chunks = [X[:5000], X[5000:5600], X[5600:13000], X[13000:]]
    obj = af.MelSpectrogram(num=128, samplate=32000, radix2_exp=11,
                            slide_length=512, is_continue=True)
    outs = []
    for c in chunks:
        pred = obj.cal_time_length(len(c))
        o = np.asarray(obj.spectrogram(c))
        assert o.shape[-1] == pred
        outs.append(o)
    stream = np.concatenate(outs, axis=-1)
    full = np.asarray(af.MelSpectrogram(
        num=128, samplate=32000, radix2_exp=11,
        slide_length=512).spectrogram(X))
    np.testing.assert_allclose(stream, full[..., :stream.shape[-1]],
                               atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_stft_continue_vs_c(tmp_path):
    xp = tmp_path / "x.npy"
    outp = tmp_path / "out.npz"
    np.save(xp, X)
    worker = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({str(_REF)!r})
FP = ctypes.POINTER(ctypes.c_float); IP = ctypes.POINTER(ctypes.c_int)
lib.stftObj_new.argtypes = [ctypes.c_void_p, ctypes.c_int, IP, IP, IP]
lib.stftObj_calTimeLength.restype = ctypes.c_int
x = np.load({str(xp)!r})
res = {{}}
for radix2, slide, sizes in {STFT_CONFIGS!r}:
    fft = 1 << radix2
    obj = ctypes.c_void_p()
    lib.stftObj_new(ctypes.byref(obj), radix2, None,
                    ctypes.byref(ctypes.c_int(slide)),
                    ctypes.byref(ctypes.c_int(1)))
    outs = []
    pos = 0
    for s in sizes:
        c = x[pos:pos+s]; pos += s
        T = lib.stftObj_calTimeLength(obj, ctypes.c_int(len(c)))
        re = np.zeros((max(T, 0)+2)*fft, np.float32)
        im = np.zeros((max(T, 0)+2)*fft, np.float32)
        lib.stftObj_stft(obj,
                         np.ascontiguousarray(c, np.float32).ctypes.data_as(FP),
                         ctypes.c_int(len(c)), re.ctypes.data_as(FP),
                         im.ctypes.data_as(FP))
        if T > 0:
            m = fft//2+1
            outs.append((re[:T*fft].reshape(T, fft)[:, :m]
                         + 1j*im[:T*fft].reshape(T, fft)[:, :m]
                         ).astype(np.complex64))
    res[f"{{radix2}}_{{slide}}"] = (np.concatenate(outs, axis=0)
                                    if outs else np.zeros((0, 1), np.complex64))
np.savez({str(outp)!r}, **res)
"""
    r = subprocess.run([sys.executable, "-c", worker], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    cz = np.load(outp)
    for radix2, slide, sizes in STFT_CONFIGS:
        st = STFT(radix2_exp=radix2, window_type=af.types.WindowType.RECT,
                  slide_length=slide, is_continue=True)
        outs = []
        pos = 0
        for s in sizes:
            c = X[pos:pos+s]
            pos += s
            pred = st.cal_time_length(len(c))
            o = np.asarray(st.stft(c))
            assert o.shape[-1] == pred
            if o.shape[-1]:
                outs.append(o.T)
        mine = np.concatenate(outs, axis=0)
        ref = cz[f"{radix2}_{slide}"]
        assert mine.shape == ref.shape, (radix2, slide)
        np.testing.assert_allclose(mine, ref, atol=5e-5)


@pytest.mark.skipif(not os.path.exists(_REF),
                    reason="reference oracle not built")
def test_cqt_continue_vs_c(tmp_path):
    sizes = [9000, 800, 6000, 4200]
    xp = tmp_path / "x.npy"
    outp = tmp_path / "out.npy"
    np.save(xp, X)
    worker = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({str(_REF)!r})
FP = ctypes.POINTER(ctypes.c_float); IP = ctypes.POINTER(ctypes.c_int)
lib.cqtObj_newWith.argtypes = [ctypes.c_void_p, ctypes.c_int, IP, FP, IP,
                               FP, FP, FP, IP, IP, IP, IP, IP]
lib.cqtObj_calTimeLength.restype = ctypes.c_int
x = np.load({str(xp)!r})
num = 84
obj = ctypes.c_void_p()
lib.cqtObj_newWith(ctypes.byref(obj), num,
    ctypes.byref(ctypes.c_int(32000)), None, None, None, None, None,
    None, None, ctypes.byref(ctypes.c_int(1)), None, None)
outs = []
pos = 0
for s in {sizes!r}:
    c = np.ascontiguousarray(x[pos:pos+s], np.float32); pos += s
    T = lib.cqtObj_calTimeLength(obj, ctypes.c_int(len(c)))
    re = np.zeros((max(T, 0)+2)*num, np.float32)
    im = np.zeros((max(T, 0)+2)*num, np.float32)
    lib.cqtObj_cqt(obj, c.ctypes.data_as(FP), ctypes.c_int(len(c)),
                   re.ctypes.data_as(FP), im.ctypes.data_as(FP))
    if T > 0:
        outs.append((re[:T*num] + 1j*im[:T*num]).reshape(T, num
                    ).astype(np.complex64))
np.save({str(outp)!r}, np.concatenate(outs, axis=0))
"""
    r = subprocess.run([sys.executable, "-c", worker], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    ref = np.load(outp)
    c = af.CQT(num=84, samplate=32000, is_continue=True,
               normal_type=af.types.SpectralFilterBankNormalType.NONE)
    outs = []
    pos = 0
    for s in sizes:
        seg = X[pos:pos+s]
        pos += s
        pred = c.cal_time_length(len(seg))
        o = np.asarray(c.cqt(seg))
        assert o.shape[-1] == pred
        if o.shape[-1]:
            outs.append(o.T)
    mine = np.concatenate(outs, axis=0)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-5)
