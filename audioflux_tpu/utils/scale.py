"""Feature scalers, applied per feature column over the sample axis (axis 0).

Math follows the reference ``src/vector/flux_vector.c`` (__v*scale) and the
column-wise application in ``python/audioflux/utils/scale.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "min_max_scale", "standard_scale", "stand_scale", "max_abs_scale",
    "robust_scale", "center_scale", "mean_scale", "arctan_scale",
]


def min_max_scale(X):
    X = jnp.asarray(X)
    mn = jnp.min(X, axis=0, keepdims=True)
    mx = jnp.max(X, axis=0, keepdims=True)
    return jnp.where(mx > mn, (X - mn) / (mx - mn), X)


def standard_scale(X, tp: int = 1):
    """tp=0 sample variance (ddof=1), tp=1 population variance (ddof=0)."""
    X = jnp.asarray(X)
    mean = jnp.mean(X, axis=0, keepdims=True)
    std = jnp.std(X, axis=0, keepdims=True, ddof=1 - tp)
    return jnp.where(std != 0, (X - mean) / std, X)


stand_scale = standard_scale  # reference naming


def max_abs_scale(X):
    X = jnp.asarray(X)
    mx = jnp.max(jnp.abs(X), axis=0, keepdims=True)
    return jnp.where(mx != 0, X / mx, X)


def _quantile_ref(X, num, den):
    """Reference quantile: positional pick on the raw array
    (index (length+1)*num/den - 1; average with the next if not divisible)."""
    n = X.shape[0]
    idx = (n + 1) * num // den - 1
    mod = (n + 1) * num % den
    idx = max(idx, 0)
    if mod == 0:
        return X[idx]
    return (X[idx] + X[min(idx + 1, n - 1)]) / 2


def robust_scale(X):
    X = jnp.asarray(X)
    q2 = _quantile_ref(X, 1, 2)
    q1 = _quantile_ref(X, 1, 4)
    q3 = _quantile_ref(X, 3, 4)
    # columns where q3<=q1 are never written by the C (__vrobustscale
    # guards the whole loop), so the wrapper's zero-filled output buffer
    # comes back as ZEROS there — not a passthrough
    return jnp.where(q3 > q1, (X - q2) / (q3 - q1), 0.0)


def center_scale(X):
    X = jnp.asarray(X)
    return X - jnp.mean(X, axis=0, keepdims=True)


def mean_scale(X):
    X = jnp.asarray(X)
    mn = jnp.min(X, axis=0, keepdims=True)
    mx = jnp.max(X, axis=0, keepdims=True)
    mean = jnp.mean(X, axis=0, keepdims=True)
    return jnp.where(mx > mn, (X - mean) / (mx - mn), X)


def arctan_scale(X):
    return jnp.arctan(jnp.asarray(X)) / (jnp.pi / 2)
