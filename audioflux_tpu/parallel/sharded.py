"""Sharded transforms: frame-block sequence parallelism with halo exchange.

A long recording is sharded along time into equal blocks (one per chip on the
'time' mesh axis). STFT frames starting inside a block need ``fft - slide``
samples from the right neighbor — the exact tail the reference's streaming
``isContinue`` mode carries across chunks (``stft_algorithm.c:474-600``); here
it travels over ICI via ``jax.lax.ppermute`` instead of a host buffer.

Frame-count convention under sharding: each block of L samples (L a multiple
of ``slide``) yields ``L // slide`` frames, so the global output has
``n // slide`` frames; the final ``fft//slide - 1`` frames (whose windows
spill past the signal end) wrap around the ring and must be dropped by the
caller — ``valid_frames`` gives the count matching the unsharded transform.

ISTFT is the adjoint: local weighted overlap-add produces a block of length
``L + fft - slide``; the ``fft - slide`` tail is ppermuted to the right
neighbor and added to its head (halo add-back), reproducing single-chip
overlap-add exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioflux_tpu.ops.frame import frame_signal
from audioflux_tpu.transforms.spectrogram import Spectrogram

__all__ = ["sharded_spectrogram_fn", "sharded_stft_fn", "sharded_istft_fn",
           "valid_frames"]


def _right_halo(x_loc, axis_name, halo_len):
    """Fetch the first ``halo_len`` samples of the right neighbor's block."""
    n = jax.lax.axis_size(axis_name)
    perm = [((i + 1) % n, i) for i in range(n)]  # src -> dst (right to left)
    return jax.lax.ppermute(x_loc[..., :halo_len], axis_name, perm)


def valid_frames(n_samples: int, fft_length: int, slide_length: int) -> int:
    """Frames of the sharded output that match the unsharded transform."""
    return (n_samples - fft_length) // slide_length + 1


def sharded_stft_fn(mesh: Mesh, fft_length: int, slide_length: int, window,
                    batch_axis: str = "data", time_axis: str = "time"):
    """Build a shard_map'd STFT over (batch, n) -> (batch, n//slide, fre).

    Input sharded (batch: data axis, samples: time axis); output frames
    sharded along the same time axis.
    """
    window = jnp.asarray(window)
    halo = fft_length - slide_length

    def local_stft(x_loc):
        ext = jnp.concatenate(
            [x_loc, _right_halo(x_loc, time_axis, halo)], axis=-1)
        n_frames = x_loc.shape[-1] // slide_length
        frames = frame_signal(ext, fft_length, slide_length, n_frames)
        return jnp.fft.rfft(frames * window, axis=-1)

    return jax.jit(jax.shard_map(
        local_stft, mesh=mesh,
        in_specs=P(batch_axis, time_axis),
        out_specs=P(batch_axis, time_axis, None)))


def sharded_istft_fn(mesh: Mesh, fft_length: int, slide_length: int, window,
                     method_type: int = 0,
                     batch_axis: str = "data", time_axis: str = "time"):
    """Inverse of sharded_stft_fn: (batch, T, fre) complex -> (batch, n).

    Weighted overlap-add with cross-shard halo add-back; output sample count
    is ``T_global * slide`` (the spill past each block travels right).
    """
    window = jnp.asarray(window)
    halo = fft_length - slide_length
    e = 1.0 if method_type == 0 else 0.0
    win1 = np.power(np.asarray(window), e).astype(np.float32)
    win2 = np.power(np.asarray(window), e + 1.0).astype(np.float32)

    def local_istft(D_loc):  # (B_loc, T_loc, fre)
        frames = jnp.fft.irfft(D_loc, n=fft_length, axis=-1)
        T_loc = frames.shape[-2]
        out_len = T_loc * slide_length + halo
        idx = (np.arange(T_loc)[:, None] * slide_length
               + np.arange(fft_length)[None, :]).reshape(-1)
        contrib = (frames * win1).reshape(frames.shape[:-2] + (-1,))
        y = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
        y = y.at[..., idx].add(contrib)
        norm = jnp.zeros((out_len,), frames.dtype)
        norm = norm.at[idx].add(jnp.tile(jnp.asarray(win2), T_loc))

        # halo add-back: my tail overlaps the right neighbor's head
        n = jax.lax.axis_size(time_axis)
        perm = [(i, (i + 1) % n) for i in range(n)]  # send tail rightwards
        tail_y = jax.lax.ppermute(y[..., -halo:], time_axis, perm)
        tail_n = jax.lax.ppermute(norm[-halo:], time_axis, perm)
        my_idx = jax.lax.axis_index(time_axis)
        tail_y = jnp.where(my_idx == 0, 0.0, tail_y)  # no wrap into block 0
        tail_n = jnp.where(my_idx == 0, 0.0, tail_n)

        y = y[..., :-halo].at[..., :halo].add(tail_y)
        norm = norm[:-halo].at[:halo].add(tail_n)
        norm = jnp.where(norm < 1e-6, 1.0, norm)
        return y / norm

    return jax.jit(jax.shard_map(
        local_istft, mesh=mesh,
        in_specs=P(batch_axis, time_axis, None),
        out_specs=P(batch_axis, time_axis)))


def sharded_spectrogram_fn(plan: Spectrogram, mesh: Mesh,
                           batch_axis: str = "data", time_axis: str = "time",
                           with_xxcc: int = 0, fused: bool = False,
                           fused_tile: int = 200,
                           fused_interpret: bool = False):
    """Build a shard_map'd filterbank-spectrogram pipeline from a plan.

    (batch, n) float32, batch sharded on ``batch_axis`` and samples on
    ``time_axis`` -> (batch, num, n//slide) sharded over (batch, time).
    If ``with_xxcc`` > 0, returns (spec, xxcc) with that many coefficients.
    Currently covers the einsum scales (mel/bark/erb/linspace/octave/log).

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
            return mel, cc

        out_specs_f = (P(batch_axis, None, time_axis),
                       P(batch_axis, None, time_axis))
        return jax.jit(jax.shard_map(
            local_fused, mesh=mesh,
            in_specs=P(batch_axis, time_axis),
            out_specs=out_specs_f,
            check_vma=False))  # pallas_call outputs carry no vma info

    def local_spec(x_loc):
        ext = jnp.concatenate(
            [x_loc, _right_halo(x_loc, time_axis, halo)], axis=-1)
        n_frames = x_loc.shape[-1] // slide
        frames = frame_signal(ext, fft_length, slide, n_frames)
        spec = jnp.fft.rfft(frames * window, axis=-1)
        re, im = jnp.real(spec), jnp.imag(spec)
        S = re * re + im * im
        if mag:
            S = jnp.sqrt(S)
        out = jnp.einsum("...tf,nf->...tn", S, fb, precision=hp)
        if with_xxcc:
            r = jnp.log10(jnp.maximum(out, 1e-8))
            cc = jnp.einsum("...tn,kn->...tk", r, dct_m, precision=hp)
            return jnp.swapaxes(out, -1, -2), jnp.swapaxes(cc, -1, -2)
        return jnp.swapaxes(out, -1, -2)

    out_specs = (P(batch_axis, None, time_axis),
                 P(batch_axis, None, time_axis)) if with_xxcc else \
        P(batch_axis, None, time_axis)
    return jax.jit(jax.shard_map(
        local_spec, mesh=mesh,
        in_specs=P(batch_axis, time_axis),
        out_specs=out_specs))
