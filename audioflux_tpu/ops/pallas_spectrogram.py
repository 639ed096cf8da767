"""Fused Pallas mel-spectrogram + MFCC kernel.

The hot path of the framework (reference benchmark: mel spectrogram + MFCC,
``benchmark/`` in the reference repo) is HBM-bound when expressed as
separate XLA ops: the framed tile (frames x fft = ~4x data expansion), the
FFT intermediates and the power spectrum each round-trip HBM.  This kernel
fuses the whole pipeline in VMEM:

    audio rows -> overlapped framing -> window -> real-DFT (MXU matmul)
    -> power -> mel filterbank matmul -> log10 -> DCT (MFCC)

HBM traffic becomes audio-in + (mel, mfcc)-out only, and all the FLOPs run
as large MXU matmuls.  The DFT is the dense real-input transform
``frames @ [cos|sin]`` over the n_fft//2+1 non-mirrored bins — more FLOPs
than an FFT, but on the MXU it is faster than XLA's HBM-streaming FFT and
it fuses with the mel projection.

Mosaic layout rules shape the framing: in-kernel overlapped slicing of one
audio block concatenates vectors at different sublane offsets (unsupported),
so the caller passes ``k = n_fft//slide`` slide-shifted *views* of the row-
reshaped audio and the kernel concatenates them along the lane dimension
(zero sublane offset for every operand).

The generic (XLA-fft) path in ``transforms.spectrogram`` remains the
default and handles every shape; this kernel is the TPU fast path used by
``bench.py`` and ``MelSpectrogram.spectrogram_fused``.  It works for any
power-domain filterbank (mel/bark/erb/linear...), requires slide | n_fft,
128 | slide, and frame count divisible by the frame tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedMelPlan", "fused_mel_mfcc"]


class FusedMelPlan:
    """Precomputed constants for the fused kernel.

    Parameters mirror ``MelSpectrogram``: ``window`` (n_fft,), ``mel_fb``
    (num_mel, n_fft//2+1) power-domain filterbank, ``dct`` (cc_num, num_mel)
    MFCC matrix (type-II, as in the reference's xxcc path).
    """

    def __init__(self, window, mel_fb, dct, slide_length: int):
        window = np.asarray(window, np.float32)
        mel_fb = np.asarray(mel_fb, np.float32)
        dct = np.asarray(dct, np.float32)
        self.n_fft = int(window.shape[0])
        self.slide = int(slide_length)
        assert self.n_fft % self.slide == 0, "fused kernel needs slide | fft"
        assert self.slide % 128 == 0, "fused kernel needs 128 | slide"
        self.k = self.n_fft // self.slide
        self.num_mel = int(mel_fb.shape[0])
        self.cc_num = int(dct.shape[0])

        n_bins = self.n_fft // 2 + 1
        nb_pad = -n_bins % 128
        self.n_bins_pad = n_bins + nb_pad
        n = np.arange(self.n_fft)[:, None]
        kk = np.arange(self.n_bins_pad)[None, :]
        ang = -2.0 * np.pi * n * kk / self.n_fft
        dr = np.cos(ang)
        di = np.sin(ang)
        dr[:, n_bins:] = 0.0
        di[:, n_bins:] = 0.0
        self.dr = dr.astype(np.float32)
        self.di = di.astype(np.float32)
        # bf16 hi/lo splits for the fast (bf16x3) path: x@D ~ xh@Dh + xh@Dl
        # + xl@Dh, three single-pass MXU dots instead of six fp32 passes.
        import ml_dtypes
        for name in ("dr", "di"):
            full = getattr(self, name)
            hi = full.astype(ml_dtypes.bfloat16)
            lo = (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            setattr(self, name + "_hi", hi)
            setattr(self, name + "_lo", lo)
        self.window = window.reshape(1, self.n_fft)

        mel_pad = -self.num_mel % 128
        self.mel_pad = self.num_mel + mel_pad
        mel_p = np.zeros((self.n_bins_pad, self.mel_pad), np.float32)
        mel_p[:n_bins, :self.num_mel] = mel_fb.T
        self.mel_p = mel_p
        cc_pad = -self.cc_num % 8
        dct_t = np.zeros((self.mel_pad, self.cc_num + cc_pad), np.float32)
        dct_t[:self.num_mel, :self.cc_num] = dct.T
        self.dct_t = dct_t
        self.cc_pad = self.cc_num + cc_pad


def _kernel(*refs, n_shift: int, log_floor: float, precision, fast: bool):
    if fast:
        (win_ref, drh_ref, drl_ref, dih_ref, dil_ref, melp_ref,
         dct_ref) = refs[n_shift:n_shift + 7]
        mel_out, cc_out = refs[n_shift + 7:]
    else:
        (win_ref, dr_ref, di_ref, melp_ref,
         dct_ref) = refs[n_shift:n_shift + 5]
        mel_out, cc_out = refs[n_shift + 5:]
    # framing: concat the k slide-shifted row views along lanes
    frames = jnp.concatenate([refs[q][0] for q in range(n_shift)], axis=1)
    frames = frames * win_ref[0]
    if fast:
        # bf16x3: one rounding split of the frames, pre-split D matrices
        fh = frames.astype(jnp.bfloat16)
        fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot3(h_ref, l_ref):
            d = functools.partial(jax.lax.dot,
                                  preferred_element_type=jnp.float32)
            return d(fh, h_ref[...]) + d(fh, l_ref[...]) + d(fl, h_ref[...])

        xr = dot3(drh_ref, drl_ref)
        xi = dot3(dih_ref, dil_ref)
    else:
        xr = jax.lax.dot(frames, dr_ref[...], precision=precision)
        xi = jax.lax.dot(frames, di_ref[...], precision=precision)
    power = xr * xr + xi * xi
    mel = jax.lax.dot(power, melp_ref[...], precision=precision)
    mel_out[0, :, :] = mel
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc_out[0, :, :] = jax.lax.dot(logm, dct_ref[...], precision=precision)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def _fused_call(plan: FusedMelPlan, x, n_frames: int, tile: int,
                precision, interpret: bool, fast: bool):
    b = x.shape[0]
    n_tiles = n_frames // tile
    rows = x[:, :(n_frames + plan.k - 1) * plan.slide].reshape(
        b, n_frames + plan.k - 1, plan.slide)
    shifts = [jax.lax.slice_in_dim(rows, q, q + n_frames, axis=1)
              for q in range(plan.k)]
    kern = functools.partial(_kernel, n_shift=plan.k, log_floor=1e-8,
                             precision=precision, fast=fast)

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)

    if fast:
        d_consts = [plan.dr_hi, plan.dr_lo, plan.di_hi, plan.di_lo]
    else:
        d_consts = [plan.dr, plan.di]
    consts = ([plan.window] + d_consts + [plan.mel_p, plan.dct_t])
    shift_spec = pl.BlockSpec((1, tile, plan.slide), lambda i, t: (i, t, 0))
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[shift_spec] * plan.k + [_const(c) for c in consts],
        out_specs=[
            pl.BlockSpec((1, tile, plan.mel_pad), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, tile, plan.cc_pad), lambda i, t: (i, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_frames, plan.mel_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_frames, plan.cc_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*shifts, *[jnp.asarray(c) for c in consts])
    return mel[..., :plan.num_mel], cc[..., :plan.cc_num]


def fused_mel_mfcc(plan: FusedMelPlan, x, tile: int = 200,
                   precision=jax.lax.Precision.HIGHEST,
                   interpret: bool = False, fast: bool = False):
    """(B, n) audio -> (B, num_mel, T), (B, cc_num, T).

    ``n`` must be at least ``T*slide + (fft - slide)`` with ``T`` divisible
    by ``tile`` (tile a multiple of 8).  Callers with other lengths should
    pad (the generic path has no such restriction).
    """
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None]
        squeeze = True
    else:
        squeeze = False
    n = x.shape[-1]
    n_frames = (n - plan.n_fft) // plan.slide + 1
    if n_frames % tile:
        raise ValueError(f"frame count {n_frames} not divisible by tile "
                         f"{tile}; pad the input")
    mel, cc = _fused_call(plan, x, n_frames, tile, precision, interpret,
                          fast)
    mel = jnp.swapaxes(mel, -1, -2)
    cc = jnp.swapaxes(cc, -1, -2)
    if squeeze:
        mel, cc = mel[0], cc[0]
    return mel, cc
