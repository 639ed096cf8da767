"""Harmonic/percussive source separation (median-filter + Wiener masks).

Reference ``src/mir/hpss_algorithm.c``: STFT (hamm) -> magnitude ->
median filter along time (h_order) and frequency (p_order) -> soft masks
h^2/(h^2+p^2) -> two ISTFTs (:193-330). Everything is one fused jitted
computation; the per-frame C loops disappear into batched ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.ops.filter import median_filter
from audioflux_tpu.ops.pallas_median import median_filter_last_axis
from audioflux_tpu.ops.frame import cal_time_length, frame_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.transforms.stft import _istft_tm_pair, _ola_frames
from audioflux_tpu.types import WindowType

__all__ = ["HPSS", "HPSSNMF"]


@partial(jax.jit, static_argnames=("fft_length", "slide_length", "h_order",
                                   "p_order", "use_kernel", "interpret"))
def _hpss_impl(x, window, *, fft_length, slide_length, h_order, p_order,
               use_kernel=None, interpret=False):
    from audioflux_tpu.ops import pallas_fft as pfft

    frames = frame_signal(x, fft_length, slide_length)
    m = fft_length // 2 + 1
    if use_kernel is None:  # static: resolved at trace time per YIN's
        use_kernel = pfft.supports(fft_length)  # packed_fft convention
    if use_kernel:
        # TPU: four-step matmul fft kernel.  The full hermitian spectrum
        # lives in the kernel's T-layout; only the magnitude crosses to
        # natural bin order (the medians need ordered frequency axes).
        zr, zi = pfft.fft4_fwd(frames * window,
                               interpret=interpret)  # (..., T, n1, 128)
        mag = pfft.t_to_natural(
            jnp.sqrt(zr * zr + zi * zi))[..., :m]
    else:
        D = afft.rfft(frames * window, axis=-1)     # (..., T, m)
        mag = jnp.abs(D)

    # Pallas sliding-median kernel on TPU, jnp fallback elsewhere
    h = jnp.swapaxes(
        median_filter_last_axis(jnp.swapaxes(mag, -1, -2), h_order), -1, -2)
    p = median_filter_last_axis(mag, p_order)
    h2, p2 = h * h, p * p
    denom = jnp.maximum(h2 + p2, 1e-16)

    if use_kernel:
        # real Wiener masks applied directly to the full spectrum:
        # Hm*phase == (h2/denom)*X.  Masks are hermitian-symmetric
        # (M[n-k] = M[k]) so both extend to all n bins by a mirror, ride
        # one f32 relayout each into T-layout, and BOTH resyntheses run
        # as ONE inverse kernel: ifft((Mh + i*Mp) * X) = h + i*p.
        Mh = h2 / denom
        Mp = p2 / denom
        mir = lambda M: jnp.concatenate(
            [M, jnp.flip(M[..., 1:m - 1], axis=-1)], axis=-1)
        n1 = fft_length // 128
        MhT = pfft.natural_to_t(mir(Mh), n1)
        MpT = pfft.natural_to_t(mir(Mp), n1)
        pr = MhT * zr - MpT * zi
        pi = MhT * zi + MpT * zr
        fr, fi = pfft.fft4_inv(pr, pi,
                               interpret=interpret)  # h-, p-frames
        y = _ola_frames(jax.lax.complex(fr, fi), window,
                        fft_length=fft_length, slide_length=slide_length,
                        method_type=0)
        return jnp.real(y), jnp.imag(y)

    phase = D / jnp.maximum(mag, 1e-16)
    Hm = h2 / denom * mag
    Pm = p2 / denom * mag
    # masks are already time-major (no band-major round trip), and both
    # resyntheses ride ONE complex ISTFT: ifft(Hfull + i*Pfull) = h + i*p
    return _istft_tm_pair(Hm * phase, Pm * phase, window,
                          fft_length=fft_length, slide_length=slide_length,
                          method_type=0)


def _flatness(x, axis):
    """Spectral/temporal flatness: geometric / arithmetic mean."""
    x = jnp.maximum(x, 1e-12)
    g = jnp.exp(jnp.mean(jnp.log(x), axis=axis))
    a = jnp.mean(x, axis=axis)
    return g / jnp.maximum(a, 1e-12)


@partial(jax.jit, static_argnames=("fft_length", "slide_length", "k",
                                   "max_iter", "tp"))
def _hpss_nmf_impl(x, window, W0, H0, *, fft_length, slide_length, k,
                   max_iter, tp, thresh):
    from audioflux_tpu.classic.nmf import _nmf_impl

    frames = frame_signal(x, fft_length, slide_length)
    D = afft.rfft(frames * window, axis=-1)  # (T, m)
    mag = jnp.abs(D)
    phase = D / jnp.maximum(mag, 1e-16)

    V = jnp.swapaxes(mag, -1, -2)  # (m, T)
    W, H = _nmf_impl(V, W0, H0, max_iter=max_iter, tp=tp,
                     thresh=thresh, norm=0)
    # component lens: a percussive basis is spectrally flat (broadband)
    # with a peaked activation; a harmonic one is the opposite.  Compare
    # the two flatnesses per component and soft-route the whole rank-1
    # term to one side (mask multiply keeps this jit-friendly: no gathers).
    flat_w = _flatness(W, axis=0)          # (k,)
    flat_h = _flatness(H, axis=1)          # (k,)
    is_h = (flat_w <= flat_h).astype(jnp.float32)
    _HI = jax.lax.Precision.HIGHEST  # match _nmf_impl's f32 accumulation
    Sh = jnp.maximum(jnp.matmul(W * is_h, H, precision=_HI), 0.0)  # (m, T)
    Sp = jnp.maximum(jnp.matmul(W * (1.0 - is_h), H, precision=_HI), 0.0)
    h2, p2 = Sh * Sh, Sp * Sp
    denom = jnp.maximum(h2 + p2, 1e-16)
    Hm = jnp.swapaxes(h2 / denom, -1, -2) * mag    # (T, m)
    Pm = jnp.swapaxes(p2 / denom, -1, -2) * mag

    return _istft_tm_pair(Hm * phase, Pm * phase, window,
                          fft_length=fft_length, slide_length=slide_length,
                          method_type=0)


class HPSSNMF:
    """NMF-based harmonic/percussive separation.

    The reference advertises this variant ("HPSS - Median filtering, NMF
    algorithm", ``python/audioflux/mir/hpss.py:16`` / README) but its C
    core only implements the median path (``src/mir/hpss_algorithm.c``),
    so the composition here is a documented original design built from
    the reference's own NMF (``src/classic/nmf.c:112-235``): magnitude
    STFT -> rank-k NMF -> per-component harmonic/percussive routing by
    spectral-vs-temporal flatness -> Wiener masks -> two ISTFTs.

    Single (n,) signals only (NMF state is per-signal).
    """

    def __init__(self, radix2_exp: int = 12,
                 window_type: WindowType = WindowType.HAMM,
                 slide_length: int = 1024, k: int = 16,
                 max_iter: int = 200, tp: int = 0, thresh: float = 1e-3):
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.window_type = WindowType(window_type)
        self.slide_length = slide_length if slide_length else self.fft_length // 4
        self.k = k
        self.max_iter = max_iter
        self.tp = tp
        self.thresh = thresh
        self.window = get_fft_window(self.window_type, self.fft_length)

    def cal_time_length(self, data_length: int) -> int:
        return cal_time_length(data_length, self.fft_length, self.slide_length)

    def hpss(self, data_arr, seed: int = 0):
        """(n,) -> (harmonic, percussive), each (out_n,)."""
        x = jnp.asarray(data_arr, jnp.float32)
        if x.ndim != 1:
            raise ValueError("HPSSNMF.hpss expects a single (n,) signal")
        m = self.fft_length // 2 + 1
        t = self.cal_time_length(x.shape[0])
        rng = np.random.default_rng(seed)
        W0 = jnp.asarray(rng.random((m, self.k)), jnp.float32)
        H0 = jnp.asarray(rng.random((self.k, t)), jnp.float32)
        return _hpss_nmf_impl(x, jnp.asarray(self.window), W0, H0,
                              fft_length=self.fft_length,
                              slide_length=self.slide_length, k=self.k,
                              max_iter=self.max_iter, tp=self.tp,
                              thresh=float(self.thresh))


class HPSS:
    """API mirrors ``python/audioflux/mir/hpss.py:99-230``."""

    def __init__(self, radix2_exp: int = 12,
                 window_type: WindowType = WindowType.HAMM,
                 slide_length: int = 1024, h_order: int = 21,
                 p_order: int = 31):
        if h_order < 1 or h_order % 2 == 0 or p_order < 1 or p_order % 2 == 0:
            raise ValueError("h_order/p_order must be odd positive")
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.window_type = WindowType(window_type)
        self.slide_length = slide_length if slide_length else self.fft_length // 4
        self.h_order = h_order
        self.p_order = p_order
        self.window = get_fft_window(self.window_type, self.fft_length)

    def cal_time_length(self, data_length: int) -> int:
        return cal_time_length(data_length, self.fft_length, self.slide_length)

    def cal_data_length(self, data_length: int) -> int:
        """Output length for ``data_length`` input samples
        (hpssObj_calDataLength, hpss_algorithm.c:96-111: frames the input
        then (T-1)*slide + fft)."""
        if data_length < self.fft_length:
            return 0
        t = (data_length - self.fft_length) // self.slide_length + 1
        return (t - 1) * self.slide_length + self.fft_length

    def hpss(self, data_arr):
        """(..., n) -> (harmonic, percussive), each (..., out_n)."""
        return _hpss_impl(jnp.asarray(data_arr, jnp.float32),
                          jnp.asarray(self.window),
                          fft_length=self.fft_length,
                          slide_length=self.slide_length,
                          h_order=self.h_order, p_order=self.p_order)
