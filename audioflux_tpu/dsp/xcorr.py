"""Auto/cross-correlation via FFT.

Reference ``src/dsp/xcorr_algorithm.c``: full correlation over lags
-(n-1)..(n-1), optional coefficient normalization by sqrt(sum(x^2)*sum(y^2)).
"""

from __future__ import annotations

import jax.numpy as jnp
from audioflux_tpu.ops import fft as afft
import numpy as np

from enum import IntEnum

from audioflux_tpu.features.deconv import _ceil_pow2

__all__ = ["Xcorr", "XcorrNormalType", "xcorr"]


class XcorrNormalType(IntEnum):
    NONE = 0
    COEFF = 1


def xcorr(v1, v2=None, norm_type: XcorrNormalType = XcorrNormalType.COEFF):
    """Returns (corr (..., 2n-1), max_index, max_value).

    Lag of output index i is i-(n-1). v2=None computes autocorrelation.
    """
    x = jnp.asarray(v1, jnp.float32)
    n = x.shape[-1]
    L = _ceil_pow2(2 * n)
    F1 = afft.fft(x, n=L, axis=-1)
    if v2 is None:
        prod = jnp.abs(F1) ** 2
        e2 = None
    else:
        y = jnp.asarray(v2, jnp.float32)
        F2 = afft.fft(y, n=L, axis=-1)
        prod = F1 * jnp.conj(F2)
        e2 = jnp.sum(y * y, axis=-1, keepdims=True)
    r = jnp.real(afft.ifft(prod, axis=-1))
    out = jnp.concatenate([r[..., L - (n - 1):], r[..., :n]], axis=-1)
    if XcorrNormalType(norm_type) == XcorrNormalType.COEFF:
        e1 = jnp.sum(x * x, axis=-1, keepdims=True)
        scale = jnp.sqrt(e1 * (e1 if e2 is None else e2))
        out = out / scale
    idx = jnp.argmax(out, axis=-1)
    val = jnp.max(out, axis=-1)
    return out, idx, val


class Xcorr:
    """API mirrors ``python/audioflux/dsp/xcorr.py`` (default NONE like
    the reference's ``xcorr`` method)."""

    def xcorr(self, data_arr1, data_arr2=None,
              xcorr_normal_type: XcorrNormalType = XcorrNormalType.NONE):
        return xcorr(data_arr1, data_arr2, xcorr_normal_type)
