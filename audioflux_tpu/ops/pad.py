"""Signal padding with the reference's position x mode semantics.

Reference: ``src/stft_algorithm.c:601-694`` (__stftObj_dealPadData) and
``src/vector/flux_vectorOp.c:613-790`` (__vpad_*).

With padding enabled the reference first *drops the tail* ``n % slide``
samples (``__calTimeAndTailLen``, stft_algorithm.c:813-835), then pads
``fft_length`` total samples around the remainder:

- CENTER: ``fft//2`` on the left, ``fft - fft//2`` on the right
- LEFT:   ``fft`` on the left
- RIGHT:  ``fft`` on the right

Modes: CONSTANT (value1 left / value2 right for CENTER, value1 otherwise),
REFLECT (no edge repeat), WRAP.

Quirk reproduced for parity: for LEFT/RIGHT constant padding the reference
passes the float pad value into ``__vpad_left1/right1(..., int value)``
(flux_vectorOp.c:641-651), so it is implicitly truncated toward zero;
only CENTER keeps the float values.
"""

from __future__ import annotations

import jax.numpy as jnp

from audioflux_tpu.types import PaddingModeType, PaddingPositionType

__all__ = ["pad_signal"]


def pad_signal(x: jnp.ndarray, fft_length: int, slide_length: int,
               position: PaddingPositionType = PaddingPositionType.CENTER,
               mode: PaddingModeType = PaddingModeType.CONSTANT,
               value1: float = 0.0, value2: float = 0.0) -> jnp.ndarray:
    """Pad the last axis per the reference STFT padding semantics.

    Returns the padded signal of static length
    ``(n // slide) * slide + fft_length``.
    """
    n = x.shape[-1]
    keep = (n // slide_length) * slide_length
    x = x[..., :keep]

    if position == PaddingPositionType.CENTER:
        left, right = fft_length // 2, fft_length - fft_length // 2
    elif position == PaddingPositionType.LEFT:
        left, right = fft_length, 0
    else:  # RIGHT
        left, right = 0, fft_length

    pad_width = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    if mode == PaddingModeType.CONSTANT:
        if position == PaddingPositionType.CENTER:
            # reference __vpad_center1: value1 left, value2 right
            out = jnp.pad(x, pad_width, mode="constant",
                          constant_values=((0, 0),) * (x.ndim - 1) + ((value1, value2),))
        else:
            # __vpad_left1/right1 declare the value as int: truncate
            # toward zero (jnp.trunc matches C's float->int conversion)
            out = jnp.pad(x, pad_width, mode="constant",
                          constant_values=jnp.trunc(jnp.float32(value1)))
    elif mode == PaddingModeType.REFLECT:
        out = jnp.pad(x, pad_width, mode="reflect")
    elif mode == PaddingModeType.WRAP:
        out = jnp.pad(x, pad_width, mode="wrap")
    else:
        raise ValueError(f"unsupported padding mode {mode!r}")
    return out
