"""STFT / ISTFT — batched, jitted, TPU-first.

Replaces the reference's per-frame FFT loop (``src/stft_algorithm.c:696-806``)
with a single framed-tile ``afft.rfft`` over ``(..., T, fft)``; the window
multiply fuses into the same XLA computation. ISTFT implements weighted
overlap-add with COA normalization (``stft_algorithm.c:304-409``).

Frame-count semantics are bit-exact with the C library:
``(n - fft) // slide + 1`` unpadded, ``n // slide + 1`` padded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np

from audioflux_tpu.ops.frame import cal_data_length, cal_time_length, frame_signal
from audioflux_tpu.ops.pad import pad_signal
from audioflux_tpu.ops.window import get_fft_window
from audioflux_tpu.types import PaddingModeType, PaddingPositionType, WindowType

__all__ = ["STFT", "stft", "istft"]


@partial(jax.jit, static_argnames=("fft_length", "slide_length", "is_pad",
                                   "position", "mode"))
def _stft_impl(x, window, *, fft_length, slide_length, is_pad,
               position, mode, value1=0.0, value2=0.0):
    from audioflux_tpu.observe import scope
    if is_pad:
        with scope("af.pad"):
            x = pad_signal(x, fft_length, slide_length,
                           PaddingPositionType(position),
                           PaddingModeType(mode), value1, value2)
    with scope("af.frame"):
        frames = frame_signal(x, fft_length, slide_length)
    with scope("af.rfft"):
        spec = afft.rfft(frames * window, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., fft//2+1, T)


@partial(jax.jit, static_argnames=("fft_length", "slide_length", "method_type"))
def _istft_impl(D, window, *, fft_length, slide_length, method_type):
    # D: (..., fft//2+1, T) complex -> (..., (T-1)*slide + fft) real
    return _istft_tm(jnp.swapaxes(D, -1, -2), window,
                     fft_length=fft_length, slide_length=slide_length,
                     method_type=method_type)


def _hermitian_full(spec, fft_length):
    """(..., m) half spectrum -> (..., n) full hermitian extension."""
    zh = jnp.conj(spec)[..., 1:fft_length // 2]
    return jnp.concatenate([spec, jnp.flip(zh, axis=-1)], axis=-1)


@partial(jax.jit, static_argnames=("fft_length", "slide_length",
                                   "method_type", "use_kernel", "interpret"))
def _istft_tm(spec, window, *, fft_length, slide_length, method_type,
              use_kernel=None, interpret=False):
    """ISTFT from a time-major (..., T, F/2+1) spectrum — callers whose
    masks already live frames-first (HPSS) skip a band-major round trip
    (two full strided relayouts of the complex matrix)."""
    from audioflux_tpu.ops import pallas_fft as pfft
    if use_kernel is None:  # static, trace-time (YIN's packed convention)
        use_kernel = pfft.supports(fft_length)
    if use_kernel:
        # four-step kernel irfft: hermitian-extend, relayout the two f32
        # components into T-layout, one real-output inverse kernel
        zfull = _hermitian_full(spec, fft_length)
        n1 = fft_length // 128
        yr = pfft.natural_to_t(jnp.real(zfull), n1)
        yi = pfft.natural_to_t(jnp.imag(zfull), n1)
        frames, _ = pfft.fft4_inv(yr, yi, out_imag=False,
                                  interpret=interpret)
    else:
        frames = afft.irfft(spec, n=fft_length, axis=-1)  # (..., T, F)
    return _ola_frames(frames, window, fft_length=fft_length,
                       slide_length=slide_length, method_type=method_type)


@partial(jax.jit, static_argnames=("fft_length", "slide_length",
                                   "method_type", "use_kernel", "interpret"))
def _istft_tm_pair(spec_a, spec_b, window, *, fft_length, slide_length,
                   method_type, use_kernel=None, interpret=False):
    """TWO ISTFTs for the price of one full complex ifft.

    For real outputs a = istft(A) and b = istft(B), linearity gives
    ifft(Afull + i*Bfull) = a_frames + i*b_frames, where Xfull is the
    Hermitian extension of the half-spectrum X.  The combined full
    spectrum is built directly from the two (..., T, F/2+1) halves:
    bins 0..N/2 are A + iB; bin N-j (j=1..N/2-1) is
    conj(A[j]) + i*conj(B[j]) = conj(A[j] - i*B[j]).  The OLA then runs
    once on the complex frames (real-linear throughout) and the pair is
    recovered as (Re, Im).  This mirrors the fs4 frame-pair packing and
    halves HPSS's resynthesis cost (reference runs two full ISTFTs,
    hpss_algorithm.c:300,325).
    """
    # irfft drops the imaginary parts of the DC and Nyquist bins
    # (Hermitian-consistency convention, verified vs jnp.fft.irfft);
    # force them real so the packed ifft matches _istft_tm bit-for-bit
    # on arbitrary (even inconsistent) inputs.
    edge = jnp.zeros(spec_a.shape[-1], bool).at[0].set(True).at[-1].set(True)
    spec_a = jnp.where(edge, jnp.real(spec_a).astype(spec_a.dtype), spec_a)
    spec_b = jnp.where(edge, jnp.real(spec_b).astype(spec_b.dtype), spec_b)
    zl = spec_a + 1j * spec_b                          # bins 0..N/2
    zh = jnp.conj(spec_a - 1j * spec_b)[..., 1:fft_length // 2]
    zfull = jnp.concatenate([zl, jnp.flip(zh, axis=-1)], axis=-1)
    from audioflux_tpu.ops import pallas_fft as pfft
    if use_kernel is None:
        use_kernel = pfft.supports(fft_length)
    if use_kernel:
        n1 = fft_length // 128
        yr = pfft.natural_to_t(jnp.real(zfull), n1)
        yi = pfft.natural_to_t(jnp.imag(zfull), n1)
        fr, fi = pfft.fft4_inv(yr, yi, interpret=interpret)
        frames = jax.lax.complex(fr, fi)
    else:
        frames = afft.ifft(zfull, axis=-1)             # a_frames + i*b_frames
    y = _ola_frames(frames, window, fft_length=fft_length,
                    slide_length=slide_length, method_type=method_type)
    return jnp.real(y), jnp.imag(y)


def _ola_frames(frames, window, *, fft_length, slide_length, method_type):
    """Window + overlap-add + window-energy normalization of (..., T, F)
    frames.  Real-linear: works identically on complex frames (used by
    ``_istft_tm_pair`` to resynthesize two signals at once)."""
    e = 1.0 if method_type == 0 else 0.0  # 0='weighted OLA', 1='OLA'
    win1 = jnp.power(window, e)
    win2 = jnp.power(window, e + 1.0)

    T = frames.shape[-2]
    out_len = cal_data_length(T, fft_length, slide_length)

    contrib = frames * win1
    if fft_length % slide_length == 0:
        # TPU-friendly OLA: with fft = k*slide, chunk j of frame t lands at
        # output block t + j, so the overlap-add is k shifted adds of the
        # chunked frame tensor — no scatter (TPU scatter-add serializes
        # duplicate indices; this path is the HPSS resynthesis hot spot,
        # hpss_algorithm.c:233-325).  The window-energy norm goes through
        # the same shifted adds on the broadcast window.
        k = fft_length // slide_length
        n_blocks = T + k - 1

        def ola(ch):  # (..., T, k, slide) -> (..., n_blocks * slide)
            y = jnp.zeros(ch.shape[:-3] + (n_blocks, slide_length), ch.dtype)
            pad_cfg = [(0, 0)] * (ch.ndim - 3)
            for j in range(k):
                y = y + jnp.pad(ch[..., :, j, :],
                                pad_cfg + [(j, k - 1 - j), (0, 0)])
            return y.reshape(ch.shape[:-3] + (n_blocks * slide_length,))

        y = ola(contrib.reshape(contrib.shape[:-2] + (T, k, slide_length))
                )[..., :out_len]
        norm = ola(jnp.broadcast_to(
            win2.reshape(k, slide_length), (T, k, slide_length))
            )[:out_len]
    else:
        idx_np = (np.arange(T)[:, None] * slide_length
                  + np.arange(fft_length)[None, :]).reshape(-1)
        flat = contrib.reshape(frames.shape[:-2] + (-1,))
        y = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
        y = y.at[..., idx_np].add(flat)
        norm = jnp.zeros((out_len,), frames.dtype)
        norm = norm.at[idx_np].add(jnp.tile(win2, T))
    norm = jnp.where(norm < 1e-6, 1.0, norm)
    return y / norm


def stft(x, fft_length: int, slide_length: int,
         window_type: WindowType = WindowType.RECT,
         is_pad: bool = False,
         position: PaddingPositionType = PaddingPositionType.CENTER,
         mode: PaddingModeType = PaddingModeType.CONSTANT,
         value1: float = 0.0, value2: float = 0.0,
         window=None):
    """Functional STFT. Returns complex64 (..., fft_length//2+1, time)."""
    if window is None:
        window = get_fft_window(window_type, fft_length)
    return _stft_impl(jnp.asarray(x, jnp.float32), jnp.asarray(window),
                      fft_length=fft_length, slide_length=slide_length,
                      is_pad=is_pad, position=int(position), mode=int(mode),
                      value1=value1, value2=value2)


def istft(D, fft_length: int, slide_length: int,
          window_type: WindowType = WindowType.RECT, method_type: int = 0,
          window=None):
    """Functional ISTFT (weighted overlap-add by default)."""
    if window is None:
        window = get_fft_window(window_type, fft_length)
    return _istft_impl(jnp.asarray(D), jnp.asarray(window),
                       fft_length=fft_length, slide_length=slide_length,
                       method_type=method_type)


class STFT:
    """Short-time Fourier transform plan.

    Parameters mirror the reference Python API (``python/audioflux/stft.py``):
    ``radix2_exp`` sets ``fft_length = 2**radix2_exp``; default window RECT,
    default slide 1024.
    """

    def __init__(self, radix2_exp: int = 12,
                 window_type: WindowType = WindowType.RECT,
                 slide_length: int = 1024, is_continue: bool = False):
        if not 1 <= radix2_exp <= 30:
            raise ValueError("radix2_exp must be in [1, 30]")
        self.radix2_exp = radix2_exp
        self.fft_length = 1 << radix2_exp
        self.window_type = WindowType(window_type)
        self.slide_length = slide_length if slide_length else self.fft_length // 4

        self.window = get_fft_window(self.window_type, self.fft_length)
        self.is_pad = False
        self.position = PaddingPositionType.CENTER
        self.mode = PaddingModeType.CONSTANT
        self.value1 = 0.0
        self.value2 = 0.0
        # the C stftObj_new isContinue param (stft_algorithm.c:84); the
        # reference Python wrapper pins it False, this exposes it
        self.is_continue = bool(is_continue)
        self._carry = (TailCarry(self.fft_length, self.slide_length)
                       if self.is_continue else None)

    # -- config ------------------------------------------------------------
    def set_continue(self, flag: bool):
        """Toggle cross-call tail carry (stftObj_setContinue, :182);
        enabling resets any pending tail."""
        self.is_continue = bool(flag)
        self._carry = (TailCarry(self.fft_length, self.slide_length)
                       if self.is_continue else None)

    def set_slide_length(self, slide_length: int):
        if slide_length > 0:
            self.slide_length = slide_length
            if self._carry is not None:
                self._carry = TailCarry(self.fft_length, self.slide_length)

    def enable_padding(self, flag: bool):
        self.is_pad = bool(flag)

    def set_padding(self, position_type=None, mode_type=None,
                    value1=None, value2=None):
        if not self.is_pad:
            return
        if position_type is not None:
            self.position = PaddingPositionType(position_type)
        if mode_type is not None:
            self.mode = PaddingModeType(mode_type)
        if value1 is not None:
            self.value1 = float(value1)
        if value2 is not None:
            self.value2 = float(value2)

    def use_window_data_arr(self, data_arr: np.ndarray):
        if data_arr.shape[-1] != self.fft_length:
            raise ValueError(f"window length must be {self.fft_length}")
        self.window = np.asarray(data_arr, dtype=np.float32)

    def get_window_data_arr(self) -> np.ndarray:
        return self.window

    # -- shape math ---------------------------------------------------------
    def cal_time_length(self, data_length: int) -> int:
        if self._carry is not None and not self.is_pad:
            return self._carry.cal_time_length(data_length)
        return cal_time_length(data_length, self.fft_length, self.slide_length,
                               self.is_pad)

    def cal_data_length(self, time_length: int) -> int:
        return cal_data_length(time_length, self.fft_length, self.slide_length)

    # -- exec ----------------------------------------------------------------
    def stft(self, data_arr):
        """Compute the STFT. data_arr: (..., n) -> complex64 (..., fre, time).

        With ``is_continue`` set (and padding off), consecutive calls
        carry the unconsumed tail exactly like the C stftObj.
        """
        if self._carry is not None and not self.is_pad:
            buf = self._carry.feed(np.asarray(data_arr, np.float32))
            if buf is None:
                shape = (np.shape(data_arr)[:-1]
                         + (self.fft_length // 2 + 1, 0))
                return np.zeros(shape, np.complex64)
            data_arr = buf
        return _stft_impl(jnp.asarray(data_arr, jnp.float32),
                          jnp.asarray(self.window),
                          fft_length=self.fft_length,
                          slide_length=self.slide_length,
                          is_pad=self.is_pad,
                          position=int(self.position), mode=int(self.mode),
                          value1=self.value1, value2=self.value2)

    def istft(self, m_data_arr, method_type: int = 0):
        """Inverse STFT. m_data_arr: complex (..., fre, time) -> (..., n)."""
        return _istft_impl(jnp.asarray(m_data_arr), jnp.asarray(self.window),
                           fft_length=self.fft_length,
                           slide_length=self.slide_length,
                           method_type=method_type)

    # -- coords (API parity) --------------------------------------------------
    def y_coords(self, samplate: int = 32000):
        return np.linspace(0, samplate / 2, self.fft_length // 2 + 1)

    def x_coords(self, data_length: int, samplate: int = 32000):
        T = self.cal_time_length(data_length)
        return np.arange(T) * self.slide_length / samplate


class TailCarry:
    """The stftObj ``isContinue`` cross-call tail state
    (stft_algorithm.c:474-600, non-pad path).

    Each :meth:`feed` consumes ``tail + chunk``; when at least one frame
    fits it returns the sample buffer covering the completed frames and
    carries ``(total - fft) % slide + (fft - slide)`` samples forward;
    otherwise it accumulates the chunk and returns ``None``.  When
    ``slide > fft`` the carry is NEGATIVE — that many samples of the next
    chunk are skipped, exactly as the C's ``tailDataLength < 0`` branch.

    Supports ``(..., n)`` batches (the C streams 1-D; leading dims must
    stay consistent across calls).  The carried tail is exactly the halo
    a frame-block shard receives from its left neighbor in the sharded
    pipeline (``audioflux_tpu.parallel``).
    """

    def __init__(self, fft_length: int, slide_length: int):
        self.fft_length = int(fft_length)
        self.slide_length = int(slide_length)
        self.reset()

    def reset(self):
        self.tail = np.zeros(0, np.float32)
        self.tail_len = 0

    def cal_time_length(self, data_length: int) -> int:
        """Frames the next feed of ``data_length`` samples would emit
        (stftObj_calTimeLength adds the pending tail, :243)."""
        total = self.tail_len + int(data_length)
        if total < self.fft_length:
            return 0
        return (total - self.fft_length) // self.slide_length + 1

    def feed(self, x):
        x = np.asarray(x, np.float32)
        fft, slide = self.fft_length, self.slide_length
        if self.tail_len < 0:
            buf = x[..., -self.tail_len:]
        elif self.tail_len:
            buf = np.concatenate([self.tail, x], axis=-1)
        else:
            buf = x
        total = self.tail_len + x.shape[-1]
        if total < fft:
            self.tail = np.array(buf, np.float32, copy=True)
            self.tail_len = total
            return None
        tail_len = (total - fft) % slide + (fft - slide)
        if tail_len > 0:
            self.tail = np.array(buf[..., total - tail_len:total],
                                 np.float32, copy=True)
        else:
            self.tail = np.zeros(0, np.float32)
        self.tail_len = tail_len
        # the FULL tail+chunk buffer, like the C's curDataArr/validDataArr
        # (the unconsumed tail stays in it — framing emits
        # (total-fft)//slide+1 frames either way, but downstream
        # resampling/padding chains SEE those samples, e.g. the CQT's
        # lower octaves)
        return buf


class StreamingSTFT:
    """Chunked STFT with tail-carry, matching the reference ``isContinue``
    semantics (stft_algorithm.c:474-600): each call consumes
    ``tail + chunk``, emits the frames that fit, and carries the last
    ``(n - fft) % slide + (fft - slide)`` samples into the next call.

    The carried tail is exactly the halo a frame-block shard must receive
    from its left neighbor in the sharded pipeline (see
    ``audioflux_tpu.parallel``).
    """

    def __init__(self, radix2_exp: int = 12,
                 window_type: WindowType = WindowType.RECT,
                 slide_length: int = 1024):
        self._stft = STFT(radix2_exp, window_type, slide_length)
        self.fft_length = self._stft.fft_length
        self.slide_length = self._stft.slide_length
        self._carry = TailCarry(self.fft_length, self.slide_length)

    @property
    def _tail(self):  # kept for callers poking the halo state
        return self._carry.tail

    def reset(self):
        self._carry.reset()

    def process(self, chunk):
        """Feed a chunk; returns the complex (fre, frames) for the frames
        completed by this chunk (possibly 0 columns)."""
        buf = self._carry.feed(chunk)
        if buf is None:
            m = self.fft_length // 2 + 1
            return np.zeros((m, 0), np.complex64)
        return np.asarray(self._stft.stft(buf))
