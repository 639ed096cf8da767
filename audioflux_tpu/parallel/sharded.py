"""Sharded transforms: frame-block sequence parallelism with halo exchange.

A long recording is sharded along time into equal blocks (one per chip on the
'time' mesh axis). STFT frames starting inside a block need ``fft - slide``
samples from the right neighbor — the exact tail the reference's streaming
``isContinue`` mode carries across chunks (``stft_algorithm.c:474-600``); here
it travels over ICI via ``jax.lax.ppermute`` instead of a host buffer.

Frame-count convention: each block of L samples (L a multiple of ``slide``)
computes ``L // slide`` frame slots, but the transforms *return the trimmed
global result* — exactly ``valid_frames(n, fft, slide)`` frames, matching the
unsharded transform bit for bit.  Internally the final ``fft//slide - 1``
slots (whose windows would spill past the signal end and wrap around the
ring) are zero-masked on the last time shard before the trim, so no
wrap-around garbage ever exists even in the untrimmed intermediate.

ISTFT is the adjoint: the input (T frames) is zero-padded to a whole number
of equal time shards, padded slots are masked out of both the overlap-add
and the window-energy normalization, each block's ``fft - slide`` spill is
ppermuted to the right neighbor and added to its head (halo add-back), and
the output is trimmed to ``(T - 1) * slide + fft`` samples — the same length
the single-chip inverse produces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audioflux_tpu.ops import fft as afft
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioflux_tpu.ops.frame import frame_signal
from audioflux_tpu.transforms.spectrogram import Spectrogram

__all__ = ["sharded_spectrogram_fn", "sharded_stft_fn", "sharded_istft_fn",
           "valid_frames"]


def _pin_native_fft(fn):
    """Trace the wrapped graph with ops.fft pinned to the native XLA FFT
    (GSPMD partitions the FFT HLO; it may replicate a pallas_call —
    see ops/backend.py native_fft_scope)."""
    def wrapped(*a, **k):
        from audioflux_tpu.ops.backend import native_fft_scope
        with native_fft_scope():
            return fn(*a, **k)
    return wrapped

def _right_halo(x_loc, axis_name, halo_len):
    """Fetch the first ``halo_len`` samples of the right neighbor's block."""
    n = jax.lax.axis_size(axis_name)
    perm = [((i + 1) % n, i) for i in range(n)]  # src -> dst (right to left)
    return jax.lax.ppermute(x_loc[..., :halo_len], axis_name, perm)


def valid_frames(n_samples: int, fft_length: int, slide_length: int) -> int:
    """Frames of the sharded output that match the unsharded transform."""
    return (n_samples - fft_length) // slide_length + 1


def _frame_mask(t_loc: int, t_valid: int, time_axis: str):
    """Bool (t_loc,) marking this shard's frame slots that are < t_valid."""
    start = jax.lax.axis_index(time_axis) * t_loc
    return (start + jnp.arange(t_loc)) < t_valid


def sharded_stft_fn(mesh: Mesh, fft_length: int, slide_length: int, window,
                    batch_axis: str = "data", time_axis: str = "time"):
    """Build a shard_map'd STFT over (batch, n) -> (batch, T_valid, fre).

    Input sharded (batch: data axis, samples: time axis); output matches
    the unsharded transform's frame count (wrap-around slots are masked
    and trimmed — no caller-side slicing needed).
    """
    window = jnp.asarray(window)
    halo = fft_length - slide_length

    def local_stft(x_loc):
        ext = jnp.concatenate(
            [x_loc, _right_halo(x_loc, time_axis, halo)], axis=-1)
        n_frames = x_loc.shape[-1] // slide_length
        frames = frame_signal(ext, fft_length, slide_length, n_frames)
        D = afft.rfft(frames * window, axis=-1)
        n_glob = x_loc.shape[-1] * jax.lax.axis_size(time_axis)
        t_valid = valid_frames(n_glob, fft_length, slide_length)
        mask = _frame_mask(n_frames, t_valid, time_axis)
        return jnp.where(mask[:, None], D, 0)

    smapped = jax.shard_map(
        local_stft, mesh=mesh,
        in_specs=P(batch_axis, time_axis),
        out_specs=P(batch_axis, time_axis, None))

    def run(x):
        tv = valid_frames(x.shape[-1], fft_length, slide_length)
        return smapped(x)[..., :tv, :]

    return jax.jit(_pin_native_fft(run))


def sharded_istft_fn(mesh: Mesh, fft_length: int, slide_length: int, window,
                     method_type: int = 0,
                     batch_axis: str = "data", time_axis: str = "time"):
    """Inverse of sharded_stft_fn: (batch, T, fre) complex -> (batch, n).

    Accepts the trimmed frame count produced by ``sharded_stft_fn`` (any T);
    output length is ``(T - 1) * slide + fft``, the single-chip convention.
    """
    window = jnp.asarray(window)
    halo = fft_length - slide_length
    e = 1.0 if method_type == 0 else 0.0
    win1 = np.power(np.asarray(window), e).astype(np.float32)
    win2 = np.power(np.asarray(window), e + 1.0).astype(np.float32)
    n_time = int(mesh.shape[time_axis])

    def make_local(t_orig: int):
        def local_istft(D_loc):  # (B_loc, T_loc, fre)
            frames = afft.irfft(D_loc, n=fft_length, axis=-1)
            T_loc = frames.shape[-2]
            mask = _frame_mask(T_loc, t_orig, time_axis).astype(frames.dtype)
            out_len = T_loc * slide_length + halo
            contrib = frames * win1 * mask[:, None]
            normc = jnp.asarray(win2)[None, :] * mask[:, None]
            if fft_length % slide_length == 0:
                # k shifted adds instead of a duplicate-index scatter
                # (TPU scatter-add serializes; same trick as the
                # single-chip _istft_impl)
                k = fft_length // slide_length

                def ola(ch):  # (..., T, fft) -> (..., T*slide + halo)
                    c3 = ch.reshape(ch.shape[:-2]
                                    + (T_loc, k, slide_length))
                    y_ = jnp.zeros(ch.shape[:-2]
                                   + (T_loc + k - 1, slide_length), ch.dtype)
                    pc = [(0, 0)] * (c3.ndim - 3)
                    for j in range(k):
                        y_ = y_ + jnp.pad(c3[..., :, j, :],
                                          pc + [(j, k - 1 - j), (0, 0)])
                    return y_.reshape(ch.shape[:-2]
                                      + ((T_loc + k - 1) * slide_length,))

                y = ola(contrib)[..., :out_len]
                norm = ola(normc)[:out_len]
            else:
                idx = (np.arange(T_loc)[:, None] * slide_length
                       + np.arange(fft_length)[None, :]).reshape(-1)
                y = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
                y = y.at[..., idx].add(
                    contrib.reshape(frames.shape[:-2] + (-1,)))
                norm = jnp.zeros((out_len,), frames.dtype)
                norm = norm.at[idx].add(normc.reshape(-1))

            # halo add-back: my tail overlaps the right neighbor's head
            n = jax.lax.axis_size(time_axis)
            perm = [(i, (i + 1) % n) for i in range(n)]  # send tail right
            tail_y = jax.lax.ppermute(y[..., -halo:], time_axis, perm)
            tail_n = jax.lax.ppermute(norm[-halo:], time_axis, perm)
            my_idx = jax.lax.axis_index(time_axis)
            tail_y = jnp.where(my_idx == 0, 0.0, tail_y)  # no wrap into 0
            tail_n = jnp.where(my_idx == 0, 0.0, tail_n)

            y = y[..., :-halo].at[..., :halo].add(tail_y)
            norm = norm[:-halo].at[:halo].add(tail_n)
            norm = jnp.where(norm < 1e-6, 1.0, norm)
            return y / norm

        return local_istft

    def run(D):
        t = D.shape[-2]
        # pad the frame axis so every shard is equal AND the padded length
        # covers the final frame's spill: (t_pad - t + 1) * slide >= fft
        k1 = -(-halo // slide_length)  # ceil((fft - slide) / slide)
        t_pad = -(-(t + k1) // n_time) * n_time
        D_p = jnp.pad(D, [(0, 0)] * (D.ndim - 2) + [(0, t_pad - t), (0, 0)])
        y = jax.shard_map(
            make_local(t), mesh=mesh,
            in_specs=P(batch_axis, time_axis, None),
            out_specs=P(batch_axis, time_axis))(D_p)
        return y[..., :(t - 1) * slide_length + fft_length]

    return jax.jit(_pin_native_fft(run))


def sharded_spectrogram_fn(plan: Spectrogram, mesh: Mesh,
                           batch_axis: str = "data", time_axis: str = "time",
                           with_xxcc: int = 0, fused: bool = False,
                           fused_tile: int = 200,
                           fused_interpret: bool = False):
    """Build a shard_map'd filterbank-spectrogram pipeline from a plan.

    (batch, n) float32, batch sharded on ``batch_axis`` and samples on
    ``time_axis`` -> (batch, num, T_valid) — the same frame count as the
    unsharded ``plan.spectrogram`` (trailing wrap-around slots are masked
    and trimmed).  If ``with_xxcc`` > 0, returns (spec, xxcc) with that
    many coefficients.  Currently covers the einsum scales
    (mel/bark/erb/linspace/octave/log).

    ``fused=True`` runs the per-shard compute through the fused Pallas
    mel+MFCC kernel (``ops.pallas_spectrogram``) after the ppermute halo
    exchange — the multi-chip form of the bench fast path.  Requires
    POWER data type, 128 | slide, and per-shard frame count divisible by
    ``fused_tile``; returns (spec, cc) (with_xxcc must be > 0).
    """
    fft_length = plan.fft_length
    slide = plan.slide_length
    halo = fft_length - slide
    window = jnp.asarray(plan.window)
    fb = jnp.asarray(plan.filter_bank)
    dct_m = jnp.asarray(plan._dct[:with_xxcc]) if with_xxcc else None
    mag = int(plan.data_type) == 1
    hp = jax.lax.Precision.HIGHEST

    def _mask_cols(arr, n_frames, t_valid):
        mask = _frame_mask(n_frames, t_valid, time_axis)
        return jnp.where(mask[None, :], arr, 0)

    if fused:
        if not with_xxcc or mag:
            raise ValueError("fused sharded path needs POWER data type "
                             "and with_xxcc > 0")
        from audioflux_tpu.ops.pallas_spectrogram import (FusedMelPlan,
                                                          fused_mel_mfcc)
        fplan = FusedMelPlan(plan.window, plan.filter_bank,
                             plan._dct[:with_xxcc], slide)

        def local_fused(x_loc):
            ext = jnp.concatenate(
                [x_loc, _right_halo(x_loc, time_axis, halo)], axis=-1)
            mel, cc = fused_mel_mfcc(fplan, ext, tile=fused_tile,
                                     fast=True, interpret=fused_interpret)
            n_frames = x_loc.shape[-1] // slide
            n_glob = x_loc.shape[-1] * jax.lax.axis_size(time_axis)
            t_valid = valid_frames(n_glob, fft_length, slide)
            return (_mask_cols(mel, n_frames, t_valid),
                    _mask_cols(cc, n_frames, t_valid))

        smapped_f = jax.shard_map(
            local_fused, mesh=mesh,
            in_specs=P(batch_axis, time_axis),
            out_specs=(P(batch_axis, None, time_axis),
                       P(batch_axis, None, time_axis)),
            check_vma=False)  # pallas_call outputs carry no vma info

        def run_fused(x):
            tv = valid_frames(x.shape[-1], fft_length, slide)
            mel, cc = smapped_f(x)
            return mel[..., :tv], cc[..., :tv]

        return jax.jit(_pin_native_fft(run_fused))

    def local_spec(x_loc):
        ext = jnp.concatenate(
            [x_loc, _right_halo(x_loc, time_axis, halo)], axis=-1)
        n_frames = x_loc.shape[-1] // slide
        frames = frame_signal(ext, fft_length, slide, n_frames)
        spec = afft.rfft(frames * window, axis=-1)
        re, im = jnp.real(spec), jnp.imag(spec)
        S = re * re + im * im
        if mag:
            S = jnp.sqrt(S)
        out = jnp.einsum("...tf,nf->...tn", S, fb, precision=hp)
        n_glob = x_loc.shape[-1] * jax.lax.axis_size(time_axis)
        t_valid = valid_frames(n_glob, fft_length, slide)
        if with_xxcc:
            r = jnp.log10(jnp.maximum(out, 1e-8))
            cc = jnp.einsum("...tn,kn->...tk", r, dct_m, precision=hp)
            return (_mask_cols(jnp.swapaxes(out, -1, -2), n_frames, t_valid),
                    _mask_cols(jnp.swapaxes(cc, -1, -2), n_frames, t_valid))
        return _mask_cols(jnp.swapaxes(out, -1, -2), n_frames, t_valid)

    out_specs = (P(batch_axis, None, time_axis),
                 P(batch_axis, None, time_axis)) if with_xxcc else \
        P(batch_axis, None, time_axis)
    smapped = jax.shard_map(
        local_spec, mesh=mesh,
        in_specs=P(batch_axis, time_axis),
        out_specs=out_specs)

    def run(x):
        tv = valid_frames(x.shape[-1], fft_length, slide)
        out = smapped(x)
        if with_xxcc:
            return out[0][..., :tv], out[1][..., :tv]
        return out[..., :tv]

    return jax.jit(_pin_native_fft(run))
