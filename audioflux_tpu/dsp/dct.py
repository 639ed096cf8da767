"""Direct matrix DCT.

Reference ``src/dsp/dct_algorithm.c``: only DCT-II is actually implemented
there (the type enum exists but every type uses the DCT-II cosine matrix
and ``dctObj_idct`` is empty); here DCT-II plus the DCT-III inverse are
provided.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["DCT", "dct", "idct"]


def _dct2_matrix(n: int):
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return np.cos(np.pi * (j + 0.5) * i / n).astype(np.float32)


def dct(data_arr, is_norm: bool = False):
    """DCT-II over the last axis (dctObj_dct)."""
    x = jnp.asarray(data_arr, jnp.float32)
    n = x.shape[-1]
    m = jnp.asarray(_dct2_matrix(n))
    out = x @ m.T
    if is_norm:
        s = np.full(n, np.sqrt(2.0 / n), np.float32)
        s[0] = np.sqrt(1.0 / n)
        out = out * jnp.asarray(s)
    return out


def idct(data_arr, is_norm: bool = False):
    """DCT-III (inverse of the DCT-II above)."""
    x = jnp.asarray(data_arr, jnp.float32)
    n = x.shape[-1]
    m = jnp.asarray(_dct2_matrix(n))
    if is_norm:
        s = np.full(n, np.sqrt(2.0 / n), np.float32)
        s[0] = np.sqrt(1.0 / n)
        return (x * jnp.asarray(s)) @ m
    half = x.at[..., 0].multiply(0.5) if hasattr(x, "at") else x
    return (half @ m) * (2.0 / n)


class DCT:
    """Object API mirroring ``dctObj_*``."""

    def __init__(self, length: int, dct_type: int = 0):
        self.length = length
        self.dct_type = dct_type

    def dct(self, data_arr, is_norm: bool = False):
        return dct(data_arr, is_norm)

    def idct(self, data_arr, is_norm: bool = False):
        return idct(data_arr, is_norm)
