"""Stockwell transform (S-transform).

Reference ``src/st_algorithm.c``: one FFT of the signal, then for each
frequency bin k a gaussian frequency-window (exp(-factor*2pi^2*j^2/k^(2norm))
wrapped, st_algorithm.c:_stObj_initWinData) is applied to the circularly
shifted spectrum F[k:k+L] and IFFT'd. Bin 0 is the signal mean. The per-bin
loop (:262-286) becomes one gather + batched ifft.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

__all__ = ["ST"]


def _st_windows(fft_length: int, factor: float, norm: float,
                bins: np.ndarray) -> np.ndarray:
    j = np.arange(fft_length, dtype=np.float64)
    j2 = j * j
    jm2 = (j - fft_length) ** 2
    k = bins.astype(np.float64)[:, None]
    with np.errstate(divide="ignore"):
        v = -factor * 2 * np.pi ** 2 / np.power(k, 2 * norm)
    w = np.exp(v * j2[None, :]) + np.exp(v * jm2[None, :])
    w[bins == 0] = 0.0
    return w.astype(np.float32)


def _st_body(x, windows, bins, fft_length, annot=None):
    """The ST op graph; ``annot(arr, tag)`` lets the mesh-parallel path
    (parallel/sharded_full.py) insert sharding constraints without
    duplicating this body."""
    if annot is None:
        annot = lambda a, tag: a  # noqa: E731
    L = fft_length
    x = annot(x, "in")
    F = afft.fft(x, axis=-1)
    F2 = jnp.concatenate([F, F], axis=-1)
    # (..., nbins, L): circularly shifted spectrum per bin
    idx = bins[:, None] + jnp.arange(L)[None, :]
    shifted = annot(F2[..., idx] * windows, "bands")
    out = afft.ifft(shifted, axis=-1)
    mean = jnp.mean(x, axis=-1, keepdims=True)[..., None]
    zero_row = (bins == 0)[:, None]
    return annot(jnp.where(zero_row, mean.astype(out.dtype), out), "out")


@partial(jax.jit, static_argnames=("fft_length",))
def _st_impl(x, windows, bins, *, fft_length):
    return _st_body(x, windows, bins, fft_length)


class ST:
    """API mirrors ``python/audioflux/st.py``."""

    def __init__(self, radix2_exp: int = 12, min_index: int = 1,
                 max_index: int = None, samplate: int = 32000,
                 factor: float = 1.0, norm: float = 1.0):
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.fft_length = 1 << radix2_exp
        if max_index is None:
            max_index = self.fft_length // 2
        if (min_index >= max_index or min_index < 0
                or max_index > self.fft_length // 2):
            min_index, max_index = 0, self.fft_length // 2
        self.min_index = min_index
        self.max_index = max_index
        self.factor = float(factor)
        self.norm = float(norm)
        self.bin_arr = np.arange(min_index, max_index + 1, dtype=np.int64)
        self._windows = _st_windows(self.fft_length, self.factor, self.norm,
                                    self.bin_arr)

    def use_bin_arr(self, bin_arr):
        bin_arr = np.asarray(bin_arr, np.int64)
        if np.all((bin_arr >= 0) & (bin_arr <= self.fft_length // 2)):
            self.bin_arr = bin_arr
            self._windows = _st_windows(self.fft_length, self.factor,
                                        self.norm, self.bin_arr)

    def set_value(self, factor: float, norm: float):
        if factor != self.factor or norm != self.norm:
            self.factor, self.norm = float(factor), float(norm)
            self._windows = _st_windows(self.fft_length, self.factor,
                                        self.norm, self.bin_arr)

    def st(self, data_arr):
        """(..., 2**radix2_exp) -> complex64 (..., nbins, fft_length)."""
        x = jnp.asarray(data_arr, jnp.float32)
        if x.shape[-1] != self.fft_length:
            raise ValueError(f"data length must be {self.fft_length}")
        return _st_impl(x, jnp.asarray(self._windows),
                        jnp.asarray(self.bin_arr), fft_length=self.fft_length)

    def cst(self, data_arr):
        """Continuous ST over long signals: run the fft-length ST every
        fft/2 samples and splice the middle halves (first window keeps
        its head, the last its tail) — the same half-overlap splice the
        reference uses for long-signal CWT (``python/audioflux/cwt.py``
        ccwt; the C ST itself is single-window, st_algorithm.c:31-39).
        Length must be >= 2*(fft_length//2); the bin-0 mean row is the
        per-window mean.  Output covers (data_len // (fft_length//2)) *
        (fft_length//2) samples — the trailing ``data_len % (fft//2)``
        remainder is dropped (no partial window; pad the input to a
        multiple of fft//2 to keep the tail).  This is the single-chip
        reference for the time-sharded ``parallel.sharded_cst_fn``."""
        data_arr = jnp.asarray(data_arr, jnp.float32)
        data_len = data_arr.shape[-1]
        win_len = self.fft_length // 4
        step = win_len * 2
        win_count = (data_len // step) - 1
        if win_count < 1:
            raise ValueError(
                f"data length {data_len} too short for cst "
                f"(needs >= {2 * step})")
        parts = []
        for i in range(win_count):
            seg = data_arr[..., i * step:i * step + self.fft_length]
            if seg.shape[-1] != self.fft_length:
                break
            spec = self.st(seg)
            start = 0 if i == 0 else win_len
            end = (self.fft_length if i == win_count - 1
                   else win_len * 3)
            parts.append(spec[..., start:end])
        return jnp.concatenate(parts, axis=-1)

    def get_fre_band_arr(self):
        """Frequencies of the selected bin range (reference st.py:160)."""
        return (np.arange(self.min_index, self.max_index + 1,
                          dtype=np.float32)
                * self.samplate / self.fft_length)

    def y_coords(self, samplate: int = None):
        if samplate is None:
            samplate = self.samplate
        return self.bin_arr * samplate / self.fft_length

    def x_coords(self, samplate: int = None):
        if samplate is None:
            samplate = self.samplate
        return np.arange(self.fft_length) / samplate
