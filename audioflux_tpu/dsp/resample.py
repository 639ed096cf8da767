"""Sinc/Kaiser polyphase resampling.

Reference ``src/dsp/resample_algorithm.c``: a windowed-sinc interpolation
table (zeroNum zero-crossings x 2^nbit samples each, Kaiser window, roll-off
scaled; :_calInterpArr) evaluated per output sample with linear table
interpolation (:_resampleObj_resample). Quality presets Best/Mid/Fast set
(zeroNum, beta, rollOff) = (64,14.7697,.9476)/(32,11.6626,.8988)/
(16,8.5555,.85) (:54-90).

TPU-first design: for a rational ratio p/q the per-output tap phase repeats
every p outputs, so the whole reference inner loop collapses into p
strided cross-correlations (``lax.conv_general_dilated`` stride=q) with
precomputed per-phase tap vectors — no data-dependent gathers.

Numerical note: the C computes the per-output phase as ``float t=i/ratio``
(float32, resample_algorithm.c:483), so its interpolation phase carries a
rounding jitter that grows with the output index (~0.005 samples by
i~40000); the exact rational phases here do not reproduce that jitter, so
outputs agree to ~1e-5 for small p (e.g. 2:1) but only to ~4e-3 on long
signals at large-p ratios (e.g. 441/640). The deviation is the C's table
-lookup jitter, not a systematic shift.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.ops.window import get_window
from audioflux_tpu.types import ResampleQualityType, WindowType

__all__ = ["Resample", "WindowResample", "resample"]

_QUALITY = {
    ResampleQualityType.BEST: (64, 9, 14.7696565, 0.9475937),
    ResampleQualityType.MID: (32, 9, 11.6625806, 0.8987969),
    ResampleQualityType.FAST: (16, 9, 8.5555046, 0.85),
}


def _interp_table(zero_num: int, nbit: int, window_type: WindowType,
                  value: float, roll_off: float) -> np.ndarray:
    """The right-half windowed-sinc table (resample_algorithm.c:546-632)."""
    bit_length = 1 << nbit
    n = zero_num * bit_length + 1
    x = np.linspace(0.0, zero_num, n) * roll_off
    s = np.sinc(x) * roll_off  # np.sinc = sin(pi x)/(pi x)
    win = get_window(window_type, 2 * (n - 1) + 1, periodic=False,
                     alpha=value, dtype=np.float64)
    return (s * win[n - 1:]).astype(np.float64)


class _Plan:
    """Per-(p, q) tap vectors: phase r covers outputs i = k*p + r."""

    def __init__(self, interp: np.ndarray, bit_length: int, p: int, q: int,
                 ratio: float):
        interp = interp * ratio if ratio < 1 else interp
        delta = np.append(np.diff(interp), 0.0)
        n_interp = len(interp)
        scale = min(1.0, ratio)
        step = int(np.floor(np.float32(scale) * bit_length))

        max_l = (n_interp) // step + 1
        max_r = max_l
        self.p, self.q = p, q
        self.base = [int(math.floor(r * q / p)) for r in range(p)]
        filts = []
        for r in range(p):
            frac = r * q / p - self.base[r]
            filt = np.zeros(max_l + max_r, np.float64)
            # left taps (applied to x[n], x[n-1], ...)
            factor = scale * frac
            fv = factor * bit_length
            off = int(np.floor(fv))
            d = fv - off
            nl = (n_interp - off) // step
            for j in range(nl):
                filt[max_l - 1 - j] = interp[off + j * step] + d * delta[off + j * step]
            # right taps (applied to x[n+1], x[n+2], ...)
            factor = scale - factor
            fv = factor * bit_length
            off = int(np.floor(fv))
            d = fv - off
            nr = (n_interp - off) // step
            for j in range(nr):
                filt[max_l + j] = interp[off + j * step] + d * delta[off + j * step]
            filts.append(filt)
        self.max_l, self.max_r = max_l, max_r
        self.filts = np.stack(filts).astype(np.float32)  # (p, taps)


def _banded_fir(lhs, ker, q, count, S=128):
    """Strided FIR as one banded matmul: ``y[.., i] = sum_t ker[t] *
    lhs[.., i*q + t]`` for i < count.

    TPU fast path: ``lax.conv_general_dilated`` with C=O=1 and a stride
    runs off the MXU (measured 56 ms for the CQT server row's 2:1 chain —
    85% of the whole row).  Blocking S=128 outputs per row turns the
    strided correlation into frames of CONTIGUOUS slices (row hop = S*q
    samples — no gather, no strided relayout) contracted against a
    (S*q + taps - q, S) banded filter matrix on the MXU.  The dense band
    does ~(q + taps/S)/taps x the MAC count of the sliding form but at
    MXU rather than VPU throughput.  Same samples, same products — only
    the accumulation order differs from the conv (float-rounding class).
    """
    taps = ker.shape[0]
    E = taps - q  # row tail borrowed from the next row
    M = -(-count // S)
    need = (M + 1) * S * q
    pad = need - lhs.shape[-1]
    if pad > 0:
        lhs = jnp.pad(lhs, [(0, 0)] * (lhs.ndim - 1) + [(0, pad)])
    base = lhs[..., :M * S * q].reshape(lhs.shape[:-1] + (M, S * q))
    nxt = lhs[..., S * q:(M + 1) * S * q].reshape(
        lhs.shape[:-1] + (M, S * q))[..., :E]
    frames = jnp.concatenate([base, nxt], axis=-1)  # (..., M, Sq+E)
    u = np.arange(S * q + E)[:, None]
    s = np.arange(S)[None, :]
    idx = u - s * q
    valid = (idx >= 0) & (idx < taps)
    Hmat = jnp.where(jnp.asarray(valid),
                     jnp.take(ker, jnp.asarray(np.clip(idx, 0, taps - 1))),
                     0.0)
    y = jnp.einsum("...mw,ws->...ms", frames, Hmat,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(lhs.shape[:-1] + (M * S,))[..., :count]


@partial(jax.jit, static_argnames=("p", "q", "out_len", "max_l", "bases",
                                   "force_matmul"))
def _poly_resample(x, filts, *, p, q, out_len, max_l, bases,
                   force_matmul=False):
    """x: (..., n) -> (..., out_len) via p strided correlations."""
    taps = filts.shape[-1]
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (len(batch_shape)) + [(max_l, taps + q * p)])
    xc = xp.reshape((-1, 1, xp.shape[-1]))  # (B, C=1, L)
    # banded-matmul path: on by default on TPU (see _banded_fir).  Guards:
    # taps > q — the banded form assumes each output window OVERLAPS the
    # next (row tail E = taps - q borrowed from the following row); large-
    # ratio polyphase plans (e.g. pitch_shift's 890/999) have per-phase
    # kernels SHORTER than the stride, where E goes negative (r4 crash:
    # concat built a 2x-wide frame tensor) and where the dense band is
    # ~q/taps x wasted MACs anyway — the strided conv is cheap there
    # because each phase produces only out_len/p samples.  E <= S*q keeps
    # the next-row borrow a single slice.
    from audioflux_tpu.ops.backend import on_tpu
    use_matmul = ((force_matmul or on_tpu())
                  and 0 < taps - q <= 128 * q)

    outs = []
    for r in range(p):
        count = -(-(out_len - r) // p)  # ceil((out_len - r)/p)
        if count <= 0:
            outs.append(None)
            continue
        start = bases[r] + 1
        lhs = jax.lax.dynamic_slice_in_dim(xc, start, xc.shape[-1] - start, -1)
        if use_matmul:
            outs.append(_banded_fir(lhs[:, 0, :], filts[r], q, count))
            continue
        ker = filts[r].reshape(1, 1, taps)
        y = jax.lax.conv_general_dilated(
            lhs, ker, window_strides=(q,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST)
        outs.append(y[:, 0, :count])

    if p == 1:
        # single phase: no interleave scatter needed
        return outs[0].reshape(batch_shape + (out_len,))

    out = jnp.zeros((xc.shape[0], out_len), x.dtype)
    for r in range(p):
        if outs[r] is not None:
            out = out.at[:, r::p].set(outs[r])
    return out.reshape(batch_shape + (out_len,))


class WindowResample:
    """Custom-window resampler
    (``python/audioflux/dsp/resample.py:160`` / resampleObj_newWithWindow)."""

    def __init__(self, zero_num: int = 64, nbit: int = 9,
                 win_type: WindowType = WindowType.HANN,
                 value: float = None, roll_off: float = 0.945,
                 is_scale: bool = False, is_continue: bool = False,
                 tail_carry: bool = False):
        window_type = win_type
        if value is None or value < 0:
            value = {WindowType.KAISER: 5.0,
                     WindowType.GAUSS: 2.5}.get(WindowType(window_type), 0.0)
        self.zero_num = int(zero_num)
        self.nbit = int(nbit)
        self.bit_length = 1 << self.nbit
        self.window_type = WindowType(window_type)
        self.value = float(value)
        self.roll_off = float(roll_off)
        self.is_scale = bool(is_scale)
        self.is_continue = bool(is_continue)
        # The reference's streaming tail-carry is dead code: the tail store
        # (resample_algorithm.c:377-383) is guarded by dealArr, which is
        # only non-NULL once a tail exists (:416), so the remainder samples
        # are silently DROPPED each chunk. Default mirrors the C exactly;
        # tail_carry=True enables the evidently-intended SAMPLE-CONSERVING
        # carry: no input sample is dropped and per-chunk output lengths
        # keep the C's q-truncation formula.  Each chunk is still filtered
        # with per-chunk FIR context (zero history at its edges, as in the
        # C), so a few dozen boundary outputs per chunk carry warm-up
        # transients — bounded by tests/test_streaming.py's chunk fuzz
        # (<2% of samples).  Fully seamless emission would have to delay
        # outputs by the filter's right support, changing the per-chunk
        # length contract.
        self.tail_carry = bool(tail_carry)
        self._interp = _interp_table(self.zero_num, self.nbit,
                                     self.window_type, self.value,
                                     self.roll_off)
        self.ratio = 0.5
        self.p, self.q = 1, 2
        self._plans = {}
        self._tail = np.zeros(0, np.float32)

    def set_samplate(self, source_rate: int, target_rate: int):
        if source_rate == target_rate or source_rate <= 0 or target_rate <= 0:
            return
        f = Fraction(target_rate, source_rate)
        self.p, self.q = f.numerator, f.denominator
        self.ratio = target_rate / source_rate

    def enable_continue(self, flag: bool):
        """Toggle streaming mode; resets the carried tail
        (resampleObj_enableContinue, resample_algorithm.c:334-341)."""
        if not flag:
            self._tail = np.zeros(0, np.float32)
        self.is_continue = bool(flag)

    def cal_data_length(self, data_length: int) -> int:
        if self.is_continue and self.q > 1:
            # streaming: source truncated to a multiple of the down factor,
            # remainder carried to the next call (resample_algorithm.c:235-244)
            src = data_length - data_length % self.q
            return src * self.p // self.q
        return int(np.floor(data_length * self.ratio))

    def _plan(self):
        key = (self.p, self.q, round(self.ratio, 12))
        if key not in self._plans:
            self._plans[key] = _Plan(self._interp, self.bit_length,
                                     self.p, self.q, self.ratio)
        return self._plans[key]

    def resample(self, data_arr):
        """(..., n) -> (..., floor(n*ratio)).

        With ``is_continue`` (1-D input only): the source is truncated to a
        multiple of the down factor per chunk (resample_algorithm.c:235-244);
        the remainder is dropped as in the C (see ctor comment), or carried
        into the next call when ``tail_carry=True``.
        """
        x = jnp.asarray(data_arr, jnp.float32)
        if self.is_continue and self.q > 1:
            if x.ndim != 1:
                raise ValueError("is_continue streaming expects 1-D input")
            if self.tail_carry:
                x = jnp.concatenate([jnp.asarray(self._tail), x])
            n = x.shape[-1] - x.shape[-1] % self.q
            if self.tail_carry:
                self._tail = np.asarray(x[n:])
            x = x[:n]
            out_len = n * self.p // self.q
        else:
            out_len = int(np.floor(x.shape[-1] * self.ratio))
        plan = self._plan()
        y = _poly_resample(x, jnp.asarray(plan.filts), p=plan.p, q=plan.q,
                           out_len=out_len, max_l=plan.max_l,
                           bases=tuple(plan.base))
        if self.is_scale:
            y = y / np.sqrt(self.ratio).astype(np.float32)
        return y


class Resample(WindowResample):
    """Quality-preset resampler (``python/audioflux/dsp/resample.py:118``)."""

    def __init__(self, qual_type: ResampleQualityType = ResampleQualityType.BEST,
                 is_scale: bool = False, is_continue: bool = False,
                 tail_carry: bool = False):
        zero_num, nbit, beta, roll_off = _QUALITY[ResampleQualityType(qual_type)]
        super().__init__(zero_num=zero_num, nbit=nbit,
                         win_type=WindowType.KAISER, value=beta,
                         roll_off=roll_off, is_scale=is_scale,
                         is_continue=is_continue, tail_carry=tail_carry)


def resample(x, source_samplate: int, target_samplate: int,
             re_type: str = "scipy"):
    """Module-level resample: signature and semantics of the reference's
    free function (``audio.py:176-222`` — scipy-based, downsample-only
    validation; the C-style resampler lives in the :class:`Resample`
    class, use it for upsampling or the quality presets)."""
    import scipy.signal
    x = np.asarray(x, dtype=np.float32, order="C")
    if target_samplate == source_samplate:
        return x
    if not 8000 <= target_samplate < source_samplate:
        raise ValueError(
            f"target_samplate[{target_samplate}] must be between 8000 to "
            f"source_samplate[{source_samplate}]")
    if re_type == "scipy":
        num = int(np.ceil(x.shape[-1]
                          * (target_samplate * 1.0 / source_samplate)))
        return scipy.signal.resample(x, num, axis=-1)
    if re_type == "scipy_poly":
        gcd = np.gcd(source_samplate, target_samplate)
        return scipy.signal.resample_poly(x, up=target_samplate // gcd,
                                          down=source_samplate // gcd,
                                          axis=-1)
    raise ValueError(f"re_type[{re_type}] not supported")
