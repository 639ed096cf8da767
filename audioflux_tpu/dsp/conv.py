"""1-D convolution with full/same/valid modes.

Reference ``src/dsp/conv_algorithm.c``: true convolution (kernel flipped),
mode lengths full=N+M-1, same=N, valid=N-M+1; batched over leading dims via
``lax.conv_general_dilated``.
"""

from __future__ import annotations

from enum import IntEnum

import jax
import jax.numpy as jnp

__all__ = ["ConvModeType", "conv"]


class ConvModeType(IntEnum):
    FULL = 0
    SAME = 1
    VALID = 2


def conv(x, h, mode: ConvModeType = ConvModeType.FULL):
    """True convolution of (..., n) with kernel (m,)."""
    mode = ConvModeType(mode)
    x = jnp.asarray(x, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    n, m = x.shape[-1], h.shape[-1]
    batch = x.shape[:-1]
    xc = x.reshape((-1, 1, n))
    ker = h[::-1].reshape(1, 1, m)
    if mode == ConvModeType.FULL:
        pad = (m - 1, m - 1)
    elif mode == ConvModeType.SAME:
        # start offset m//2 - (1 if m even else 0) (conv_algorithm.c:236-242)
        start = m // 2 - (0 if m % 2 else 1)
        pad = (m - 1 - start, start)
    else:
        pad = (0, 0)
    y = jax.lax.conv_general_dilated(
        xc, ker, window_strides=(1,), padding=[pad],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y[:, 0, :].reshape(batch + (-1,))
