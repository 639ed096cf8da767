"""Frame extraction and frame-count math (bit-exact with the reference).

Reference formulas (``src/stft_algorithm.c:225-262, 805-835``):

- no padding: ``time_length = (n - fft_length) // slide_length + 1``
  (requires ``n >= fft_length``)
- padding:    ``time_length = n // slide_length + 1`` over the padded buffer
- inverse:    ``data_length = (time_length - 1) * slide_length + fft_length``

Framing on TPU is a strided gather producing a ``(..., T, fft)`` tile which
XLA fuses with the window multiply and feeds to the batched FFT/MXU matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["cal_time_length", "cal_data_length", "frame_signal"]


def cal_time_length(data_length: int, fft_length: int, slide_length: int,
                    is_pad: bool = False) -> int:
    if not is_pad:
        if data_length < fft_length:
            return 0
        return (data_length - fft_length) // slide_length + 1
    if data_length <= 0:
        return 0
    return data_length // slide_length + 1


def cal_data_length(time_length: int, fft_length: int, slide_length: int) -> int:
    return (time_length - 1) * slide_length + fft_length


def frame_signal(x: jnp.ndarray, fft_length: int, slide_length: int,
                 n_frames: int | None = None) -> jnp.ndarray:
    """Extract overlapping frames from the last axis.

    x: (..., n) -> (..., n_frames, fft_length).

    Shapes are static: ``n_frames`` defaults to the no-padding frame count of
    the (already padded, if applicable) input length.
    """
    n = x.shape[-1]
    if n_frames is None:
        n_frames = cal_time_length(n, fft_length, slide_length, is_pad=False)
    if n_frames <= 0:
        raise ValueError(
            f"signal too short to frame: n={n} fft_length={fft_length}")
    k, rem = divmod(fft_length, slide_length)
    if rem == 0 and k >= 1:
        # slide | fft: frame t is rows t..t+k-1 of the (n/slide, slide)
        # row reshape, so framing is k contiguous slices + one concat —
        # full-bandwidth ops, where the generic gather below runs at the
        # ~1/6-HBM-bandwidth strided path on this backend (same elements,
        # bit-identical output)
        rows = n_frames + k - 1
        usable = rows * slide_length
        if usable <= n:
            r = x[..., :usable].reshape(
                x.shape[:-1] + (rows, slide_length))
            if k == 1:
                return r
            return jnp.concatenate(
                [r[..., i:i + n_frames, :] for i in range(k)], axis=-1)
    idx = (np.arange(n_frames)[:, None] * slide_length
           + np.arange(fft_length)[None, :])
    return x[..., idx]
