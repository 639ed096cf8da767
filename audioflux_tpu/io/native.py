"""ctypes binding for the native C++ IO layer (native/wavio.cpp).

Compiles ``libafio.so`` on first use with g++ (cached next to the source);
falls back to the pure-Python WAV path if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "wav_info", "wav_read", "wav_write", "load_batch"]

_LIB = None
_TRIED = False


def _root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.environ.get(
        "AFIO_NATIVE_DIR", os.path.join(_root(), "native"))
    src = os.path.join(native_dir, "wavio.cpp")
    so = os.path.join(native_dir, "libafio.so")
    if not os.path.exists(src) and not os.path.exists(so):
        _LIB = None
        return _LIB
    try:
        if os.path.exists(src) and (
                not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", so], check=True, capture_output=True)
        lib = ctypes.cdll.LoadLibrary(so)
        lib.afio_wav_info.restype = ctypes.c_long
        lib.afio_wav_read.restype = ctypes.c_long
        lib.afio_wav_write.restype = ctypes.c_int
        lib.afio_load_batch.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def wav_info(path: str):
    """(frames, samplate, channels) or None."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = lib.afio_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        return None
    return int(n), sr.value, ch.value


def wav_read(path: str, is_mono: bool = True):
    """(audio float32, samplate) via the native decoder."""
    lib = _load()
    info = wav_info(path)
    if lib is None or info is None:
        raise IOError(f"cannot read {path}")
    frames, sr, ch = info
    out_ch = 1 if is_mono else ch
    buf = np.zeros(frames * out_ch, np.float32)
    n = lib.afio_wav_read(path.encode(),
                          buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          ctypes.c_long(frames), ctypes.c_int(1 if is_mono else 0))
    if n < 0:
        raise IOError(f"decode failed for {path}")
    if not is_mono and ch > 1:
        return buf[:n * ch].reshape(n, ch).T.copy(), sr
    return buf[:n], sr


def wav_write(path: str, data, samplate: int = 32000):
    lib = _load()
    if lib is None:
        raise IOError("native IO unavailable")
    data = np.ascontiguousarray(np.asarray(data, np.float32))
    if data.ndim == 1:
        frames, ch = len(data), 1
    else:
        ch, frames = data.shape
        data = np.ascontiguousarray(data.T)
    rc = lib.afio_wav_write(path.encode(),
                            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            ctypes.c_long(frames), ctypes.c_int(ch),
                            ctypes.c_int(samplate))
    if rc != 0:
        raise IOError(f"write failed for {path}")


def load_batch(paths, length: int, num_threads: int = 4):
    """Decode many WAVs mono into a (len(paths), length) float32 batch
    (truncate/zero-pad), using native worker threads. Returns
    (batch, ok_count)."""
    lib = _load()
    if lib is None:
        raise IOError("native IO unavailable")
    paths = list(paths)
    joined = "\n".join(paths).encode()
    out = np.zeros((len(paths), length), np.float32)
    good = lib.afio_load_batch(
        joined, ctypes.c_int(len(paths)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(length), ctypes.c_int(num_threads))
    return out, int(good)
