"""ctypes binding for the native C++ IO layer (native/wavio.cpp).

Compiles ``libafio.so`` on first use with g++ (cached next to the source);
falls back to the pure-Python WAV path if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "wav_info", "wav_read", "wav_write", "load_batch",
           "PrefetchLoader"]

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
        try:
            # pool API: absent from pre-pool prebuilt .so deployments —
            # only PrefetchLoader degrades, not the whole native layer
            lib.afio_pool_create.restype = ctypes.c_void_p
            lib.afio_pool_create.argtypes = [ctypes.c_int]
            lib.afio_pool_submit.restype = ctypes.c_int
            lib.afio_pool_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long]
            lib.afio_pool_wait.restype = ctypes.c_int
            lib.afio_pool_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.afio_pool_destroy.restype = None
            lib.afio_pool_destroy.argtypes = [ctypes.c_void_p]
            lib._afio_has_pool = True
        except AttributeError:
            lib._afio_has_pool = False
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


class PrefetchLoader:
    """Async double-buffered batch loader over the native worker pool.

    Decodes the next ``depth`` batches on persistent C++ threads while the
    caller consumes the current one, overlapping disk IO/decode with
    device compute — the input-pipeline half of a serving loop (the
    reference's streaming reader, ``python/audioflux/audio.py`` WaveReader,
    is synchronous).  Yields ``(batch, good)`` with batch (B, length)
    float32 mono (truncate/zero-pad) and ``good`` the decoded-file count.

    Use as a context manager or call :meth:`close` when done::

        with PrefetchLoader(paths, 64, 320000) as it:
            for batch, good in it:
                y = jitted_pipeline(batch)
    """

    def __init__(self, paths, batch_size: int, length: int,
                 num_threads: int = 4, depth: int = 2):
        lib = _load()
        if lib is None or not getattr(lib, "_afio_has_pool", False):
            raise IOError("native pool API unavailable")
        if batch_size < 1 or length < 1 or depth < 1:
            raise ValueError("batch_size, length and depth must be >= 1")
        self._lib = lib
        paths = list(paths)
        self._paths = [paths[i:i + batch_size]
                       for i in range(0, len(paths), batch_size)]
        self._length = int(length)
        self._depth = int(depth)
        self._pool = lib.afio_pool_create(int(num_threads))
        self._pending = {}  # job_id -> (array, n_valid)
        self._closed = False

    def _submit(self, chunk):
        out = np.zeros((len(chunk), self._length), np.float32)
        jid = self._lib.afio_pool_submit(
            self._pool, "\n".join(chunk).encode(), len(chunk),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long(self._length))
        if jid < 0:
            raise IOError("prefetch submit failed")
        self._pending[jid] = out
        return jid

    def __iter__(self):
        if self._closed:
            raise RuntimeError("loader is closed")
        order = []
        it = iter(self._paths)
        for chunk in it:
            order.append(self._submit(chunk))
            if len(order) >= self._depth:
                break
        for chunk in it:
            jid = order.pop(0)
            nxt = self._submit(chunk)  # keep the pipeline full
            good = self._lib.afio_pool_wait(self._pool, jid)
            yield self._pending.pop(jid), int(good)
            order.append(nxt)
            if self._closed:  # consumer closed mid-stream
                return
        while order:
            jid = order.pop(0)
            if self._closed:
                return
            good = self._lib.afio_pool_wait(self._pool, jid)
            yield self._pending.pop(jid), int(good)

    def close(self):
        if not self._closed:
            # drain anything not consumed so buffers stay valid
            for jid in list(self._pending):
                self._lib.afio_pool_wait(self._pool, jid)
                self._pending.pop(jid, None)
            self._lib.afio_pool_destroy(self._pool)
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass


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
