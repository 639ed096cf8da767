"""Spectral reassignment — time/frequency corrected STFT.

Reference ``src/reassign_algorithm.c``: three STFTs with windows h, dh/dn
(wrap-padded central gradient, :initWindowData) and n*h; corrections
w' = w - (sr/2pi)*Im(S_dh/S_h), t' = t + Re(S_th/S_h)/sr
(:_reassignTimeFre), thresholded/clipped to the grid (:_filterTimeFre),
then scatter-added onto (time, fre) bins with a (-1)^j sign twist
(:_rearrage). The three per-frame FFT loops fuse into one batched rfft of
a stacked window tensor; the scatter is one ``.at[].add(mode='drop')``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.ops.frame import cal_time_length, frame_signal
from audioflux_tpu.ops.pad import pad_signal
from audioflux_tpu.ops.scatter import batched_scatter_add
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.types import (PaddingModeType, PaddingPositionType,
                                 ReassignType, WindowType)

__all__ = ["Reassign", "reassign_windows"]


def reassign_windows(window: np.ndarray) -> tuple:
    """(h, dh, th) per reassign_algorithm.c:_reassignObj_initWindowData.

    dh: central gradient of the wrap-padded window; th: n*h with
    n = -N/2 .. N/2-1.
    """
    h = np.asarray(window, np.float32)
    N = h.shape[0]
    pad = np.empty(N + 2, np.float32)
    pad[1:N + 1] = h
    pad[0] = h[N - 1]
    pad[N + 1] = h[0]
    g = np.empty(N + 2, np.float32)
    g[0] = pad[1] - pad[0]
    g[-1] = pad[-1] - pad[-2]
    g[1:-1] = (pad[2:] - pad[:-2]) / 2.0
    dh = g[1:N + 1].copy()
    n = np.arange(-(N // 2), N // 2, dtype=np.float32)
    th = n * h
    return h, dh, th


@partial(jax.jit, static_argnames=("fft_length", "slide_length", "re_type",
                                   "order", "result_type", "is_padding",
                                   "use_kernel", "interpret",
                                   "force_blocked_scatter"))
def _reassign_impl(x, wins, *, fft_length, slide_length, samplate, thresh,
                   re_type, order, result_type, is_padding,
                   use_kernel=None, interpret=False,
                   force_blocked_scatter=None):
    from audioflux_tpu.ops import pallas_fft as pfft

    m = fft_length // 2 + 1
    if is_padding:
        x = pad_signal(x, fft_length, slide_length,
                       PaddingPositionType.CENTER, PaddingModeType.CONSTANT,
                       0.0, 0.0)
    frames = frame_signal(x, fft_length, slide_length)  # (..., T, N)
    T = frames.shape[-2]
    rt = ReassignType(re_type)
    # only transform the windows the correction branches actually read:
    # dh feeds the FRE correction, th the TIME one — and at T == 1 the
    # TIME correction is provably the identity (tmax == 0 clips t2 to 0,
    # exactly what the th-less branch produces), so S_th is dead there.
    need_dh = rt in (ReassignType.ALL, ReassignType.FRE)
    need_th = rt in (ReassignType.ALL, ReassignType.TIME) and T > 1
    sel = [0] + ([1] if need_dh else []) + ([2] if need_th else [])

    if use_kernel is None:  # static, trace-time (YIN's packed convention)
        use_kernel = pfft.supports(fft_length) and max(order, 1) == 1
    if use_kernel:
        # four-step fft kernel.  The corrections are per-cell elementwise
        # and the scatter consumes bin VALUES, so everything runs in the
        # kernel's T-layout — no bin-order transpose anywhere.  Bins
        # k = k1 + n1*k2 <= N/2 all live in the first (N/2)//n1 + 1
        # lanes, so a lane slice keeps the scatter input count at ~T*m
        # (the rest of the hermitian spectrum is redundant for real
        # input and would only feed the trash slot).
        n1 = fft_length // 128
        ks = (fft_length // 2) // n1 + 1
        Sr, Si = pfft.fft4_fwd(frames[..., None, :, :] * wins[sel, None, :],
                               interpret=interpret)
        Sr, Si = Sr[..., :ks], Si[..., :ks]  # (..., k, T, n1, ks)
        Sh = jax.lax.complex(Sr[..., 0, :, :, :], Si[..., 0, :, :, :])
        Sdh = (jax.lax.complex(Sr[..., 1, :, :, :], Si[..., 1, :, :, :])
               if need_dh else None)
        Sth = (jax.lax.complex(Sr[..., len(sel) - 1, :, :, :],
                               Si[..., len(sel) - 1, :, :, :])
               if need_th else None)
        # T-layout bin-index constant: kk[k1, k2] = k1 + n1*k2
        kk = (np.arange(n1, dtype=np.int32)[:, None]
              + n1 * np.arange(ks, dtype=np.int32)[None, :])
        kvalid = jnp.asarray(kk <= fft_length // 2)
        fre = jnp.asarray(kk.astype(np.float32)
                          * (samplate / 2.0) / (fft_length // 2))
        cell_shape = Sh.shape
        scat_axes = 3  # (T, n1, ks) flatten for the scatter
    else:
        # one batched rfft over the selected windows: (..., k, T, m)
        S = afft.rfft(frames[..., None, :, :] * wins[sel, None, :], axis=-1)
        Sh = S[..., 0, :, :]
        Sdh = S[..., 1, :, :] if need_dh else None
        Sth = S[..., len(sel) - 1, :, :] if need_th else None
        kk = np.arange(m, dtype=np.int32)
        kvalid = jnp.asarray(np.ones(m, bool))
        fre = jnp.linspace(0.0, samplate / 2.0, m, dtype=jnp.float32)
        cell_shape = Sh.shape
        scat_axes = 2  # (T, m)

    if rt == ReassignType.NONE:
        if use_kernel:  # BFT's plain-STFT route (is_reassign=False) lands
            # here with use_kernel auto-resolved True on TPU; relayout the
            # kernel's T-order bins back to natural order.
            Sh = jnp.swapaxes(Sh, -1, -2).reshape(
                Sh.shape[:-2] + (Sh.shape[-1] * Sh.shape[-2],))[..., :m]
        out = jnp.swapaxes(Sh, -1, -2)
        return out, out

    tim = (jnp.arange(T, dtype=jnp.float32) * slide_length) / samplate
    timb = tim[(...,) + (None,) * (scat_axes - 1)]  # broadcast over bins
    power = jnp.real(Sh) ** 2 + jnp.imag(Sh) ** 2
    good = power >= thresh * thresh
    denom = jnp.where(jnp.abs(Sh) == 0, 1.0, Sh)

    fmax = samplate / 2.0
    tmax = tim[-1]

    if need_dh:
        corr = jnp.imag(Sdh / denom) * (-0.5 * samplate / np.pi)
        w2 = fre + corr
        w2 = jnp.where(good, w2, fre)
        w2 = jnp.clip(w2, 0.0, fmax)
    else:
        w2 = jnp.broadcast_to(fre, Sh.shape)

    if need_th:
        tcorr = jnp.real(Sth / denom) / samplate
        t2 = timb + tcorr
        t2 = jnp.where(good, t2, jnp.broadcast_to(timb, Sh.shape))
        t2 = jnp.clip(t2, 0.0, tmax)
    else:
        t2 = jnp.broadcast_to(timb, Sh.shape)

    # grid indices (roundf == floor(x+0.5) for non-negative values)
    if T > 1:
        ti = jnp.floor(t2 * (T - 1) / tmax + 0.5).astype(jnp.int32)
    else:
        ti = jnp.zeros(Sh.shape, jnp.int32)
    fi = jnp.floor(w2 * (fft_length // 2) / fmax + 0.5).astype(jnp.int32)

    # order>1: iterate composition fi <- fi[fi] along the fre axis
    # (reassign_algorithm.c:_rearrage order loop; native path only —
    # the gather wants natural bin order)
    for _ in range(max(order, 1) - 1):
        valid = (fi >= 0) & (fi < m)
        gathered = jnp.take_along_axis(fi, jnp.clip(fi, 0, m - 1), axis=-1)
        fi = jnp.where(valid, gathered, 0)

    sign = jnp.where(jnp.asarray(kk) % 2 == 1, -1.0, 1.0)
    vals = Sh * sign

    in_range = (kvalid & (ti >= 0) & (ti < T)
                & (fi >= 0) & (fi < m))
    flat_idx = jnp.where(in_range, ti * m + fi, T * m)  # T*m drops

    # long recordings (T*m past the radix one-hot budget): the flat path
    # would fall back to the serialized XLA loop; the blocked scatter
    # stays on the MXU via the near-diagonal halo + exact rank-compacted
    # tail (ops/scatter.py).  TPU-gated (CPU's native scatter is fast and
    # golden-order); force_blocked_scatter: None = auto (TPU), True
    # drives it in CPU tests, False pins the flat path (chip A/B timing).
    from audioflux_tpu.ops.backend import on_tpu as _on_tpu
    from audioflux_tpu.ops.scatter import (_RADIX_MAX_OUT,
                                           reassign_blocked_scatter_add)
    use_blocked = (T * m > _RADIX_MAX_OUT
                   and (_on_tpu() if force_blocked_scatter is None
                        else force_blocked_scatter))

    def scatter(v):
        if use_blocked:
            cells = v.shape[:-scat_axes] + (T, -1)
            out = reassign_blocked_scatter_add(
                v.reshape(cells),
                jnp.broadcast_to(ti, v.shape).reshape(cells),
                jnp.broadcast_to(fi, v.shape).reshape(cells),
                jnp.broadcast_to(in_range, v.shape).reshape(cells),
                T=T, m=m)
            return out
        flat = batched_scatter_add(
            v.reshape(v.shape[:-scat_axes] + (-1,)),
            flat_idx.reshape(flat_idx.shape[:-scat_axes] + (-1,)), T * m)
        return flat.reshape(v.shape[:-scat_axes] + (T, m))

    if result_type == 0:
        out = scatter(vals)
    else:
        out = scatter(jnp.abs(vals).astype(jnp.float32)).astype(jnp.complex64)

    if use_kernel:
        # natural-order plain STFT for the second output: (k2, k1)
        # flatten of the lane-sliced T-layout is exactly bins 0..n1*ks-1
        stft_nat = jnp.swapaxes(Sh, -1, -2).reshape(
            Sh.shape[:-2] + (ks * n1,))[..., :m]
    else:
        stft_nat = Sh
    return jnp.swapaxes(out, -1, -2), jnp.swapaxes(stft_nat, -1, -2)


class Reassign:
    """API mirrors ``python/audioflux/reassign.py``.

    ``reassign(x)`` returns the reassigned spectrogram (..., fre, time):
    complex (result_type 0) or the scatter of |S_h| as real (result_type 1).
    """

    def __init__(self, radix2_exp: int = 12, samplate: int = 32000,
                 window_type: WindowType = WindowType.HANN,
                 slide_length: int = None,
                 re_type: ReassignType = ReassignType.ALL,
                 thresh: float = 0.001,
                 is_padding: bool = False):
        if not 1 < radix2_exp < 31:
            raise ValueError("radix2_exp must be in [2, 30]")
        self.radix2_exp = radix2_exp
        self.samplate = samplate
        self.fft_length = 1 << radix2_exp
        self.window_type = WindowType(window_type)
        self.slide_length = (slide_length if slide_length
                             else self.fft_length // 4)
        self.re_type = ReassignType(re_type)
        self.thresh = float(thresh)
        self.is_padding = bool(is_padding)
        self.result_type = 0
        self.order = 1

        h, dh, th = reassign_windows(
            get_fft_window(self.window_type, self.fft_length))
        self._wins = np.stack([h, dh, th])

    def set_result_type(self, result_type: int):
        """0: complex matrix, 1: real (reassign.py:148)."""
        self.result_type = int(result_type)

    def set_order(self, order: int):
        if order >= 1:
            self.order = int(order)

    def cal_time_length(self, data_length: int) -> int:
        n = data_length
        if self.is_padding:
            n += self.fft_length  # center pad fft/2 each side
        return cal_time_length(n, self.fft_length, self.slide_length)

    def reassign(self, data_arr, result_type: int = None,
                 with_stft: bool = False):
        """Reassigned matrix; ``result_type`` overrides the instance's
        (0 complex / 1 real, reassign.py:177); ``with_stft`` additionally
        returns the plain STFT (an extension)."""
        rt = self.result_type if result_type is None else int(result_type)
        out, stft = _reassign_impl(
            jnp.asarray(data_arr, jnp.float32), jnp.asarray(self._wins),
            fft_length=self.fft_length, slide_length=self.slide_length,
            samplate=self.samplate, thresh=self.thresh,
            re_type=int(self.re_type), order=self.order,
            result_type=rt, is_padding=self.is_padding)
        if rt == 1:
            out = jnp.real(out)
        return (out, stft) if with_stft else out

    def y_coords(self):
        return np.linspace(0, self.samplate / 2, self.fft_length // 2 + 1)

    def x_coords(self, data_length: int):
        T = self.cal_time_length(data_length)
        return np.arange(T) * self.slide_length / self.samplate
