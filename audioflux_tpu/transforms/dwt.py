"""Discrete wavelet transforms: DWT (Mallat), WPT (full packet tree),
SWT (stationary, à trous).

Reference ``src/{dwt,wpt,swt}_algorithm.c``: periodic padding (half filter
length each side, __periodPadding), *valid* convolution with the
decomposition filters, odd-index downsampling (DWT/WPT) or filter
upsampling (SWT, full conv). The reference's per-level conv loops become
``lax.conv_general_dilated`` calls batched over leading dims; the dyadic
reassignment to the (num, fftLength) display matrix is a precomputed
gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.filterbank.dwt import wavelet_coef
from audioflux_tpu.types import WaveletDiscreteType

__all__ = ["DWT", "WPT", "SWT"]


def _periodic_pad(x, half: int):
    """Periodic pad of ``half`` samples each side (modulo indexing —
    dwt_algorithm.c:__periodPadding).  For the common ``half <= n`` case
    this is three contiguous slices (full-bandwidth) instead of a
    strided gather."""
    n = x.shape[-1]
    if half <= n:
        return jnp.concatenate(
            [x[..., n - half:], x, x[..., :half]], axis=-1)
    idx = np.arange(-half, n + half) % n
    return x[..., idx]


def _conv_valid(x, h):
    """True 1-D convolution, valid part, batched over leading dims."""
    batch = x.shape[:-1]
    xc = x.reshape((-1, 1, x.shape[-1]))
    ker = jnp.asarray(h[::-1].copy()).reshape(1, 1, -1)
    y = jax.lax.conv_general_dilated(
        xc, ker, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y[:, 0, :].reshape(batch + (-1,))


def _dec_step(x, lo, hi):
    """One analysis level: periodic pad + valid conv + odd downsample.
    x: (..., n) -> (cA, cD) each (..., n//2)."""
    dec = len(lo)
    xp = _periodic_pad(x, dec // 2)[..., :x.shape[-1] + dec]
    a = _conv_valid(xp, lo)[..., 1::2][..., :x.shape[-1] // 2]
    d = _conv_valid(xp, hi)[..., 1::2][..., :x.shape[-1] // 2]
    return a, d


def _dyadic_rows(num: int, fft_length: int) -> np.ndarray:
    """Gather index: row i-1 of the display matrix repeats coef[2^i..2^(i+1))
    in a kLen-strided interleave (dwt_algorithm.c:287-303)."""
    rows = np.zeros((num, fft_length), np.int64)
    for i in range(num, 0, -1):
        start = 1 << i
        b_len = start
        k_len = fft_length // b_len
        for k in range(k_len):
            js = np.arange(k, fft_length, k_len)
            rows[i - 1, js] = start + np.arange(len(js))
    return rows


class DWT:
    """API mirrors ``python/audioflux/dwt.py``: ``dwt(x)`` returns
    (coef_arr, m_data_arr) of shapes (..., fftLength) / (..., num, fftLength)."""

    def __init__(self, num=None, radix2_exp=12, samplate=32000,
                 wavelet_type=WaveletDiscreteType.SYM, t1=4, t2=0):
        if num is None:
            num = radix2_exp - 1
        if not 1 <= num <= radix2_exp - 1:
            raise ValueError("num must be in [1, radix2_exp-1]")
        self.num = num
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.fft_length = 1 << radix2_exp
        self.wavelet_type = WaveletDiscreteType(wavelet_type)
        self.t1, self.t2 = t1, t2
        self.lo_d, self.hi_d = wavelet_coef(self.wavelet_type, t1, t2, 0)
        self.bin_band_arr = np.array([1 << (i + 1) for i in range(num)],
                                     np.int64)
        self.fre_band_arr = (self.bin_band_arr * samplate
                             / self.fft_length).astype(np.float32)
        self._rows = _dyadic_rows(num, self.fft_length)
        # whole decomposition cascade under one jit (eager per-op
        # dispatch over the axon tunnel costs more than the math)
        self._dwt_run = jax.jit(self._dwt_impl)

    def get_fre_band_arr(self):
        return self.fre_band_arr

    def get_bin_band_arr(self):
        return self.bin_band_arr

    def dwt(self, data_arr):
        x = jnp.asarray(data_arr, jnp.float32)
        L = self.fft_length
        if x.shape[-1] != L:
            raise ValueError(f"data length must be {L}")
        return self._dwt_run(x)

    def _dwt_impl(self, x):
        pieces = []
        cA = x
        for _ in range(self.num):
            cA, cD = _dec_step(cA, self.lo_d, self.hi_d)
            pieces.append(cD)
        # coef layout: [cA_final | cD_num | ... | cD_1]
        coef = jnp.concatenate([cA] + pieces[::-1], axis=-1)
        m_data = coef[..., jnp.asarray(self._rows)]
        return coef, m_data

    def y_coords(self):
        return self.fre_band_arr

    def x_coords(self):
        return np.arange(self.fft_length) / self.samplate


class WPT:
    """Wavelet packet transform (full binary tree with gray-code child
    ordering, wpt_algorithm.c:236-243)."""

    def __init__(self, num=None, radix2_exp=12, samplate=32000,
                 wavelet_type=WaveletDiscreteType.SYM, t1=4, t2=0):
        if num is None:
            num = radix2_exp - 1
        if not 1 <= num <= radix2_exp - 1:
            raise ValueError("num must be in [1, radix2_exp-1]")
        self.num = num
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.fft_length = 1 << radix2_exp
        self.wavelet_type = WaveletDiscreteType(wavelet_type)
        self.t1, self.t2 = t1, t2
        self.lo_d, self.hi_d = wavelet_coef(self.wavelet_type, t1, t2, 0)
        # reassign gather: row i repeats leaf i with kLen stride
        # (wpt_algorithm.c:253-270); precomputed once, reused per call
        L = self.fft_length
        down = L >> self.num
        k_len = L // down
        rows = np.zeros((1 << self.num, L), np.int64)
        for i in range(1 << self.num):
            for k in range(k_len):
                js = np.arange(k, L, k_len)
                rows[i, js] = i * down + np.arange(len(js))
        self._rows = rows
        self._wpt_run = jax.jit(self._wpt_impl)

    def get_fre_band_arr(self):
        """Leaf-band frequencies, 2**num points over [0, samplate/2]
        (reference wpt.py:135 hardcodes 16000 = 32000/2 regardless of
        samplate; generalized to samplate/2 — identical at the default
        rate)."""
        return np.linspace(0, self.samplate / 2.0, 1 << self.num,
                           dtype=np.float32)

    def wpt(self, data_arr):
        x = jnp.asarray(data_arr, jnp.float32)
        L = self.fft_length
        if x.shape[-1] != L:
            raise ValueError(f"data length must be {L}")
        return self._wpt_run(x)

    def _wpt_impl(self, x):
        nodes = {0: x}
        count = (1 << self.num) - 1
        child = 1
        for i in range(count):
            a, d = _dec_step(nodes[i], self.lo_d, self.hi_d)
            if i and i % 2 == 0:
                a, d = d, a
            nodes[child] = a
            nodes[child + 1] = d
            child += 2
        first_leaf = (1 << self.num) - 1
        leaves = [nodes[first_leaf + j] for j in range(1 << self.num)]
        coef = jnp.concatenate(leaves, axis=-1)
        m_data = coef[..., jnp.asarray(self._rows)]
        return coef, m_data

    def y_coords(self):
        return np.linspace(0, self.samplate / 2, 1 << self.num)

    def x_coords(self):
        return np.arange(self.fft_length) / self.samplate


class SWT:
    """Stationary wavelet transform (à trous — no downsampling, filters
    upsampled per level, swt_algorithm.c:178-248)."""

    def __init__(self, num, fft_length, wavelet_type=WaveletDiscreteType.SYM,
                 t1=4, t2=0):
        if num < 1:
            raise ValueError("num must be >= 1")
        if fft_length % (1 << num) != 0:
            raise ValueError("fft_length must be divisible by 2**num")
        self.num = num
        self.fft_length = fft_length
        self.wavelet_type = WaveletDiscreteType(wavelet_type)
        self.t1, self.t2 = t1, t2
        self.lo_d, self.hi_d = wavelet_coef(self.wavelet_type, t1, t2, 0)
        self._swt_run = jax.jit(self._swt_impl)

    def swt(self, data_arr):
        """(..., fft_length) -> (approx (..., num, L), detail (..., num, L))."""
        x = jnp.asarray(data_arr, jnp.float32)
        L = self.fft_length
        if x.shape[-1] != L:
            raise ValueError(f"data length must be {L}")
        return self._swt_run(x)

    def _swt_impl(self, x):
        L = self.fft_length
        dec = len(self.lo_d)
        approx, detail = [], []
        cur = x
        for i in range(self.num):
            up = dec << i  # filter buffer length at this level
            lo2 = np.zeros(up, np.float32)
            hi2 = np.zeros(up, np.float32)
            lo2[::1 << i] = self.lo_d[:]
            hi2[::1 << i] = self.hi_d[:]
            xp = _periodic_pad(cur, up // 2)[..., :L + up]
            # full conv, window [up : up+L] (swt_algorithm.c:213-230)
            pad_full = [(0, 0)] * (xp.ndim - 1) + [(up - 1, up - 1)]
            xf = jnp.pad(xp, pad_full)
            a = _conv_valid(xf, lo2)[..., up:up + L]
            d = _conv_valid(xf, hi2)[..., up:up + L]
            approx.append(a)
            detail.append(d)
            cur = a
        return jnp.stack(approx, axis=-2), jnp.stack(detail, axis=-2)
