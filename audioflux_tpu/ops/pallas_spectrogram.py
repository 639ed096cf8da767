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

        # --- four-step (Cooley-Tukey N = n1*128) constants -------------
        # x reshaped (frames, n1, 128) with n = n1_idx*128 + n2; with bin
        # index k = k1 + n1*k2:
        #   A[k1,f,n2] = sum_q W_n1[k1,q] x[f,q,n2]          (thin matmul)
        #   B = A * W_N^(k1*n2)                              (twiddle)
        #   X[k1,f,k2] = sum_n2 B[k1,f,n2] W_128[k2,n2]      (MXU matmul)
        # ~4.5x fewer MACs than the dense real-DFT; the k = k1 + n1*k2
        # permutation is folded into a per-k1 stack of mel matrices.
        n1 = self.n_fft // 128
        self.fs_n1 = n1 if (n1 >= 2 and self.n_fft == n1 * 128) else 0
        if self.fs_n1:
            import ml_dtypes
            w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1),
                                               np.arange(n1)) / n1)
            tw = np.exp(-2j * np.pi * np.outer(np.arange(n1),
                                               np.arange(128)) / self.n_fft)
            w2 = np.exp(-2j * np.pi * np.outer(np.arange(128),
                                               np.arange(128)) / 128)
            self.fs_w1r = w1.real.astype(np.float32)
            self.fs_w1i = w1.imag.astype(np.float32)
            self.fs_twr = tw.real.astype(np.float32).reshape(n1, 1, 128)
            self.fs_twi = tw.imag.astype(np.float32).reshape(n1, 1, 128)
            self.fs_w2r = w2.real.astype(np.float32)
            self.fs_w2i = w2.imag.astype(np.float32)
            # Karatsuba third matrix for the fast path: wr + wi
            self.fs_w2s = (w2.real + w2.imag).astype(np.float32)
            for name in ("fs_w2r", "fs_w2i", "fs_w2s"):
                full = getattr(self, name)
                hi = full.astype(ml_dtypes.bfloat16)
                lo = (full - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
                setattr(self, name + "_hi", hi)
                setattr(self, name + "_lo", lo)
            self.fs_win = window.reshape(n1, 1, 128)
            melp4 = np.zeros((n1, 128, self.mel_pad), np.float32)
            for k1 in range(n1):
                for k2 in range(128):
                    kbin = k1 + n1 * k2
                    if kbin < n_bins:
                        melp4[k1, k2, :self.num_mel] = mel_fb[:, kbin]
            self.fs_melp = melp4
            hi = melp4.astype(ml_dtypes.bfloat16)
            lo = (melp4 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            self.fs_melp_hi, self.fs_melp_lo = hi, lo


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


def _bf16x3(a, b_hi_ref, b_lo_ref, contract=None):
    """fp32-accurate matmul from three single-pass bf16 MXU dots."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh, bl = b_hi_ref, b_lo_ref
    if contract is None:
        d = functools.partial(jax.lax.dot,
                              preferred_element_type=jnp.float32)
    else:
        d = functools.partial(jax.lax.dot_general,
                              dimension_numbers=contract,
                              preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kernel4(*refs, n1: int, tile: int, log_floor: float, precision,
             fast: bool):
    idx = n1
    win_ref = refs[idx]
    w1r_ref, w1i_ref, twr_ref, twi_ref = refs[idx + 1:idx + 5]
    idx += 5
    if fast:
        (w2rh_ref, w2rl_ref, w2ih_ref, w2il_ref, w2sh_ref,
         w2sl_ref) = refs[idx:idx + 6]
        melph_ref, melpl_ref, dct_ref = refs[idx + 6:idx + 9]
        idx += 9
    else:
        w2r_ref, w2i_ref = refs[idx:idx + 2]
        melp_ref, dct_ref = refs[idx + 2:idx + 4]
        idx += 4
    mel_out, cc_out = refs[idx:]

    # framing: stack the n1 128-wide row views along a leading axis
    x = jnp.concatenate([refs[q][...] for q in range(n1)], axis=0)
    x = x * win_ref[...]  # (n1, tile, 128) windowed pieces

    # stage 1: thin DFT over the n1 pieces -> A[k1, f, n2]
    cd_first = (((1,), (0,)), ((), ()))
    ar = jax.lax.dot_general(w1r_ref[...], x, cd_first, precision=precision)
    ai = jax.lax.dot_general(w1i_ref[...], x, cd_first, precision=precision)
    # stage 2: twiddle
    br = (ar * twr_ref[...] - ai * twi_ref[...]).reshape(n1 * tile, 128)
    bi = (ar * twi_ref[...] + ai * twr_ref[...]).reshape(n1 * tile, 128)
    # stage 3: DFT-128 over lanes (the dominant matmul)
    cd_last = (((1,), (1,)), ((), ()))
    if fast:
        # Karatsuba: 3 complex-product matmuls instead of 4
        #   t1 = br@wr, t2 = bi@wi, t3 = (br+bi)@(wr+wi)
        #   xr = t1 - t2,  xi = t3 - t1 - t2
        t1 = _bf16x3(br, w2rh_ref[...], w2rl_ref[...], cd_last)
        t2 = _bf16x3(bi, w2ih_ref[...], w2il_ref[...], cd_last)
        t3 = _bf16x3(br + bi, w2sh_ref[...], w2sl_ref[...], cd_last)
        xr = t1 - t2
        xi = t3 - t1 - t2
    else:
        xr = (jax.lax.dot_general(br, w2r_ref[...], cd_last,
                                  precision=precision)
              - jax.lax.dot_general(bi, w2i_ref[...], cd_last,
                                    precision=precision))
        xi = (jax.lax.dot_general(br, w2i_ref[...], cd_last,
                                  precision=precision)
              + jax.lax.dot_general(bi, w2r_ref[...], cd_last,
                                    precision=precision))
    power = xr * xr + xi * xi  # (n1*tile, 128) = [k1, f, k2]

    # mel: per-k1 accumulating matmuls (bin permutation inside the matrices)
    mel = None
    for k1 in range(n1):
        p_k = power[k1 * tile:(k1 + 1) * tile]
        if fast:
            m_k = _bf16x3(p_k, melph_ref[k1], melpl_ref[k1])
        else:
            m_k = jax.lax.dot(p_k, melp_ref[k1], precision=precision)
        mel = m_k if mel is None else mel + m_k
    mel_out[0, :, :] = mel
    logm = jnp.log10(jnp.maximum(mel, log_floor))
    cc_out[0, :, :] = jax.lax.dot(logm, dct_ref[...], precision=precision)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def _fused_call4(plan: FusedMelPlan, x, n_frames: int, tile: int,
                 precision, interpret: bool, fast: bool):
    b = x.shape[0]
    n1 = plan.fs_n1
    n_tiles = n_frames // tile
    s_rows = plan.slide // 128
    n_rows = x.shape[1] // 128
    rows = x[:, :n_rows * 128].reshape(b, n_rows, 128)
    shifts = [jax.lax.slice(rows, (0, q, 0),
                            (b, q + s_rows * (n_frames - 1) + 1, 128),
                            (1, s_rows, 1))
              for q in range(n1)]
    kern = functools.partial(_kernel4, n1=n1, tile=tile, log_floor=1e-8,
                             precision=precision, fast=fast)

    def _const(arr):
        return pl.BlockSpec(arr.shape, lambda i, t: (0,) * arr.ndim)

    if fast:
        consts = [plan.fs_win, plan.fs_w1r, plan.fs_w1i, plan.fs_twr,
                  plan.fs_twi, plan.fs_w2r_hi, plan.fs_w2r_lo,
                  plan.fs_w2i_hi, plan.fs_w2i_lo,
                  plan.fs_w2s_hi, plan.fs_w2s_lo,
                  plan.fs_melp_hi, plan.fs_melp_lo, plan.dct_t]
    else:
        consts = [plan.fs_win, plan.fs_w1r, plan.fs_w1i, plan.fs_twr,
                  plan.fs_twi, plan.fs_w2r, plan.fs_w2i,
                  plan.fs_melp, plan.dct_t]
    shift_spec = pl.BlockSpec((1, tile, 128), lambda i, t: (i, t, 0))
    mel, cc = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[shift_spec] * n1 + [_const(c) for c in consts],
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
                   interpret: bool = False, fast: bool = False,
                   algo: str = "fourstep"):
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
    call = (_fused_call4 if (algo == "fourstep" and plan.fs_n1)
            else _fused_call)
    mel, cc = call(plan, x, n_frames, tile, precision, interpret, fast)
    mel = jnp.swapaxes(mel, -1, -2)
    cc = jnp.swapaxes(cc, -1, -2)
    if squeeze:
        mel, cc = mel[0], cc[0]
    return mel, cc
