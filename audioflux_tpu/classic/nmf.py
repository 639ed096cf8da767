"""Non-negative matrix factorization (multiplicative updates).

Reference ``src/classic/nmf.c``: V ~ W@H with KL (type 0), IS (type 1) or
Euclidean (else) update rules; W is column-normalized each iteration (max /
p1 / p2 per ``norm``); converges when both ||dW|| and ||dH|| < thresh.
The per-iteration matmuls run on the MXU inside a ``lax.while_loop``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NMF", "nmf"]

_EPS = 1e-16
_HI = jax.lax.Precision.HIGHEST


def _norm_w(W, norm: int):
    if norm == 1:
        v = jnp.sum(jnp.abs(W), axis=0)
    elif norm == 2:
        v = jnp.sqrt(jnp.sum(W * W, axis=0))
    else:
        v = jnp.max(W, axis=0)
    return W / jnp.where(v == 0, 1.0, v)


def _mm(a, b):
    # f32 accumulation like the reference's sgemm (nmf.c:112-156).  Default
    # MXU precision is bf16; the multiplicative updates iterate hundreds of
    # times and amplify backend rounding into different local optima
    # (chip-vs-CPU factors diverged entirely before this pin).
    return jnp.matmul(a, b, precision=_HI)


@partial(jax.jit, static_argnames=("max_iter", "tp", "norm"))
def _nmf_impl(V, W0, H0, *, max_iter, tp, thresh, norm):
    def update(W, H):
        D = _mm(W, H)
        if tp == 0:  # KL
            R = V / (D + _EPS)
            ones = jnp.ones_like(V)
            H = H * _mm(W.T, R) / (_mm(W.T, ones) + _EPS)
            W = W * _mm(R, H.T) / (_mm(ones, H.T) + _EPS)
        elif tp == 1:  # IS
            R2 = V / (D * D + _EPS)
            R1 = 1.0 / (D + _EPS)
            H = H * _mm(W.T, R2) / (_mm(W.T, R1) + _EPS)
            W = W * _mm(R2, H.T) / (_mm(R1, H.T) + _EPS)
        else:  # Euclidean
            H = H * _mm(W.T, V) / (_mm(W.T, D) + _EPS)
            W = W * _mm(V, H.T) / (_mm(_mm(W, H), H.T) + _EPS)
        return _norm_w(W, norm), H

    def cond(state):
        W, H, Wp, Hp, i = state
        dw = jnp.linalg.norm(W - Wp)
        dh = jnp.linalg.norm(H - Hp)
        return (i < max_iter) & ((dw >= thresh) | (dh >= thresh))

    def body(state):
        W, H, _, _, i = state
        Wn, Hn = update(W, H)
        return (Wn, Hn, W, H, i + 1)

    W0 = _norm_w(W0, norm)
    W1, H1 = update(W0, H0)
    state = (W1, H1, W0, H0, jnp.asarray(1))
    W, H, _, _, _ = jax.lax.while_loop(cond, body, state)
    return W, H


def nmf(X, k: int, w_arr=None, h_arr=None, max_iter: int = 300, tp: int = 0,
        thresh: float = 1e-3, norm: int = 0, seed: int = 0):
    """Factor X (n, m) into (W (n, k), H (k, m)).

    tp: 0 KL divergence, 1 IS divergence, 2 Euclidean. Mirrors
    ``python/audioflux/classic/nmf.py``.
    """
    X = jnp.asarray(X, jnp.float32)
    n, m = X.shape
    rng = np.random.default_rng(seed)
    W0 = (jnp.asarray(w_arr, jnp.float32) if w_arr is not None
          else jnp.asarray(rng.random((n, k)), jnp.float32))
    H0 = (jnp.asarray(h_arr, jnp.float32) if h_arr is not None
          else jnp.asarray(rng.random((k, m)), jnp.float32))
    return _nmf_impl(X, W0, H0, max_iter=max_iter, tp=tp,
                     thresh=float(thresh), norm=norm)


class NMF:
    """Object wrapper mirroring ``python/audioflux/classic/nmf.py``."""

    def __init__(self, k: int, max_iter: int = 300, tp: int = 0,
                 thresh: float = 1e-3, norm: int = 0):
        self.k = k
        self.max_iter = max_iter
        self.tp = tp
        self.thresh = thresh
        self.norm = norm

    def nmf(self, data_arr, w_arr=None, h_arr=None, seed: int = 0):
        return nmf(data_arr, self.k, w_arr, h_arr, self.max_iter, self.tp,
                   self.thresh, self.norm, seed)
