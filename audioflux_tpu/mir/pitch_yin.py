"""YIN pitch estimation.

Reference ``src/mir/_pitch_yin.c``: per frame, the difference function is
built from an FFT autocorrelation plus energy cumsums (:330-430), the
cumulative-mean-normalized difference (CMND) is thresholded at 0.1, the
first local trough below threshold is refined by parabolic interpolation
(:462-560). All frames run batched: the per-frame FFT loop becomes one
rfft over the framed tile and the sequential trough search becomes a
vectorized first-true-index reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.ops.frame import frame_signal

__all__ = ["PitchYIN"]


@partial(jax.jit, static_argnames=("fft_length", "slide_length",
                                   "auto_length", "min_index", "max_index",
                                   "packed_fft", "use_fft_kernel",
                                   "interpret"))
def _yin_impl(x, *, fft_length, slide_length, auto_length, min_index,
              max_index, samplate, thresh, packed_fft=None,
              use_fft_kernel=None, interpret=False):
    diff_length = fft_length - auto_length
    yin_length = max_index - min_index + 1
    frames = frame_signal(x, fft_length, slide_length)  # (..., T, N)

    # autocorrelation via circular convolution with the reversed prefix
    # (_pitch_yin.c:351-369); no aliasing in the taken range.
    rev = jnp.flip(frames[..., :auto_length + 1], axis=-1)
    if packed_fft is None:
        from audioflux_tpu.ops.backend import on_tpu
        packed_fft = on_tpu()
    if packed_fft:
        # TPU: both real transforms ride ONE complex fft.  For z = x + iy,
        # ifft(fft(z)^2) = z (*) z = (x (*) x - y (*) y) + 2i (x (*) y), so
        # Im(ifft(Z^2))/2 is exactly the x (*) rev circular convolution the
        # two-rfft form computes — 2 transforms instead of 3, no spectrum
        # reversal.  Same products to float rounding (~1e-6 rel); the
        # trough threshold sits at 0.1 so knife-edge flips are the
        # documented cross-libm class.  CPU keeps the rfft form so the
        # golden fixtures stay exact.
        rev = jnp.pad(rev, [(0, 0)] * (rev.ndim - 1)
                      + [(0, fft_length - rev.shape[-1])])
        from audioflux_tpu.ops import pallas_fft as pfft
        if use_fft_kernel is None:  # static, resolved at trace time
            use_fft_kernel = pfft.supports(fft_length)
        if use_fft_kernel:
            # ONE fused four-step kernel for the whole round trip: the
            # squaring is elementwise, so fft -> ^2 -> ifft never leaves
            # VMEM (no bin-order transposes, no mid-chain HBM trip)
            acf_full = pfft.fft4_autocorr(frames, rev, interpret=interpret)
        else:
            Z = afft.fft(jax.lax.complex(frames, rev), axis=-1)
            acf_full = 0.5 * jnp.imag(afft.ifft(Z * Z, axis=-1))
    else:
        A = afft.rfft(frames, axis=-1)
        B = afft.rfft(rev, n=fft_length, axis=-1)
        acf_full = afft.irfft(A * B, n=fft_length, axis=-1)
    acf = acf_full[..., auto_length:]
    acf = jnp.where(jnp.abs(acf) >= 1e-6, acf, 0.0)  # (..., T, diff)

    # frame energies over sliding auto_length windows (:372-390)
    csum = jnp.cumsum(frames * frames, axis=-1)
    e2 = csum[..., auto_length:] - csum[..., :diff_length]
    e2 = jnp.where(jnp.abs(e2) >= 1e-6, e2, 0.0)

    diff = e2[..., :1] + e2 - 2.0 * acf  # (..., T, diff)

    # CMND (:398-430)
    num = diff[..., min_index:max_index + 1]
    csum_d = jnp.cumsum(diff[..., 1:max_index + 1], axis=-1)
    mean = csum_d / jnp.arange(1, max_index + 1, dtype=jnp.float32)
    den = mean[..., min_index - 1:max_index]
    yin = num / (den + 1e-16)  # (..., T, yin_length)

    # parabolic interp offsets (:462-494)
    v1 = yin[..., :-2]
    v2 = yin[..., 1:-1]
    v3 = yin[..., 2:]
    offs = -(v3 - v1) / 2.0 / (2.0 * ((v1 + v3 - 2 * v2) / 2.0) + 1e-16)
    offs = jnp.where(jnp.abs(offs) <= 1.0, offs, 0.0)
    interp = jnp.pad(offs, [(0, 0)] * (yin.ndim - 1) + [(1, 1)])

    # first trough below thresh (:520-548)
    below = yin < thresh
    nxt = jnp.pad(yin[..., 1:], [(0, 0)] * (yin.ndim - 1) + [(0, 1)],
                  constant_values=np.inf)
    prv = jnp.pad(yin[..., :-1], [(0, 0)] * (yin.ndim - 1) + [(1, 0)],
                  constant_values=np.inf)
    is_trough = jnp.concatenate(
        [(yin[..., :1] < nxt[..., :1]) & below[..., :1],
         (yin[..., 1:-1] <= nxt[..., 1:-1]) & (yin[..., 1:-1] < prv[..., 1:-1])
         & below[..., 1:-1],
         jnp.zeros_like(below[..., -1:], bool)], axis=-1)
    any_t = jnp.any(is_trough, axis=-1)
    t_idx = jnp.argmax(is_trough, axis=-1)
    off = jnp.take_along_axis(interp, t_idx[..., None], axis=-1)[..., 0]
    fre = samplate / (min_index + t_idx + off)
    fre = jnp.where(any_t, fre, 0.0)
    value = jnp.take_along_axis(yin, t_idx[..., None], axis=-1)[..., 0]
    value = jnp.where(any_t, value, 0.0)
    return fre, value, yin, interp


class PitchYIN:
    """API mirrors ``python/audioflux/mir/pitch_yin.py:64-200``."""

    def __init__(self, samplate: int = 32000, low_fre: float = 27.0,
                 high_fre: float = 2000.0, radix2_exp: int = 12,
                 slide_length: int = 1024, auto_length: int = 2048):
        if low_fre < 27:
            low_fre = 27.0
        fft_length = 1 << radix2_exp
        if not (high_fre > low_fre and high_fre < samplate / 2):
            low_fre, high_fre = 27.0, 2093.0
        self.samplate = samplate
        self.low_fre = float(low_fre)
        self.high_fre = float(high_fre)
        self.radix2_exp = radix2_exp
        self.fft_length = fft_length
        self.slide_length = slide_length if slide_length else fft_length // 4
        self.auto_length = (auto_length if 0 <= auto_length < fft_length
                            else fft_length // 2)
        self.thresh = 0.1

        diff_length = fft_length - self.auto_length
        self.min_index = int(np.floor(samplate / self.high_fre))
        self.max_index = min(int(np.ceil(samplate / self.low_fre)),
                             diff_length - 1)

    def set_thresh(self, thresh: float):
        if thresh > 0:
            self.thresh = float(thresh)

    def cal_time_length(self, data_length: int) -> int:
        if data_length < self.fft_length:
            return 0
        return (data_length - self.fft_length) // self.slide_length + 1

    def _run(self, data_arr):
        return _yin_impl(jnp.asarray(data_arr, jnp.float32),
                         fft_length=self.fft_length,
                         slide_length=self.slide_length,
                         auto_length=self.auto_length,
                         min_index=self.min_index, max_index=self.max_index,
                         samplate=float(self.samplate), thresh=self.thresh)

    def pitch(self, data_arr):
        """(..., n) -> (fre_arr, value_arr) each (..., time)."""
        fre, value, yin, interp = self._run(data_arr)
        self._yin_mat = yin
        self._interp_mat = interp
        return fre, value

    def get_min_data(self):
        """Per-frame CMND minimum (the C pitch's third output, minArr)."""
        import numpy as _np
        return _np.min(_np.asarray(self._yin_mat), axis=-1)

    def get_trough_data(self, data_arr=None):
        """Per-frame trough candidates (pitchYINObj_getTroughData,
        _pitch_yin.c:246 / dealResult:586-625): every CMND local trough
        below thresh, as (fre_rows, trough_rows, len_arr).

        Uses the matrices cached by the last ``pitch`` call, or computes
        them from ``data_arr``.  1-D input only."""
        if data_arr is not None:
            self.pitch(data_arr)
        yin = np.asarray(self._yin_mat)
        interp = np.asarray(self._interp_mat)
        if yin.ndim != 2:
            raise ValueError("get_trough_data expects 1-D audio input")
        T, yl = yin.shape
        fre_rows, trough_rows, lens = [], [], []
        for i in range(T):
            a = yin[i]
            fres, vals = [], []
            for j in range(yl - 1):
                if j == 0:
                    ok = a[0] < a[1] and a[0] < self.thresh
                else:
                    ok = (a[j] <= a[j + 1] and a[j] < a[j - 1]
                          and a[j] < self.thresh)
                if ok:
                    vals.append(float(a[j]))
                    fres.append(self.samplate
                                / (self.min_index + j + float(interp[i, j])))
            fre_rows.append(np.asarray(fres, np.float32))
            trough_rows.append(np.asarray(vals, np.float32))
            lens.append(len(vals))
        return fre_rows, trough_rows, np.asarray(lens, np.int32)
