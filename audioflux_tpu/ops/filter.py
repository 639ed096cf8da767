"""Sliding median / max filters matching the reference C semantics.

- median (flux_vector.c:__vmedianfilter): odd ``order``, zero padding of
  order//2 each side, median of each window.
- max (flux_vector.c:__vmaxfilter): window [i-order//2, i-1+(order-order//2)]
  clamped to the array — shorter windows at the edges, no padding.

Both build a (., n, order) window tile and reduce — one fused XLA op per
call instead of the reference's per-row C loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["median_filter", "max_filter"]


def median_filter(x, order: int, axis: int = -1):
    """Median filter along ``axis`` with zero padding (order odd >= 3)."""
    if order < 2 or order % 2 == 0:
        return jnp.asarray(x)
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    half = order // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    idx = np.arange(n)[:, None] + np.arange(order)[None, :]
    win = xp[..., idx]  # (..., n, order)
    med = jnp.sort(win, axis=-1)[..., order // 2]
    return jnp.moveaxis(med, -1, axis)


def max_filter(x, order: int, axis: int = -1):
    """Max filter along ``axis`` with edge-clamped windows."""
    if order < 1:
        return jnp.asarray(x)
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    left = order // 2
    right = order - left
    neg = jnp.finfo(x.dtype).min
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left, right)],
                 constant_values=neg)
    idx = np.arange(n)[:, None] + np.arange(order)[None, :]
    win = xp[..., idx]
    out = jnp.max(win, axis=-1)
    return jnp.moveaxis(out, -1, axis)
