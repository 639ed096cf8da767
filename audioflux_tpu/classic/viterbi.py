"""Viterbi decoding.

Reference ``src/classic/viterbi.c``: probability-domain (or log-domain with
1e-16 flooring) maximization scan; the reference resolves the state path as
the per-frame argmax of the probability matrix (:__viterbi + "find hidden
states" loop), not by backtracking — reproduced as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["viterbi"]


def viterbi(pi_arr, m_a_arr, m_b_arr, o_arr=None, is_log: bool = False):
    """Returns (s_arr, prob, m_prob_arr).

    pi (S,), A (S, S), B (S, N), observations o (T,) int.
    """
    pi = jnp.asarray(pi_arr, jnp.float32)
    A = jnp.asarray(m_a_arr, jnp.float32)
    B = jnp.asarray(m_b_arr, jnp.float32)
    S, N = B.shape
    if o_arr is None:
        o_arr = np.arange(N)
    o = jnp.asarray(o_arr, jnp.int32)

    if is_log:
        pi = jnp.log(pi + 1e-16)
        A = jnp.log(A + 1e-16)
        B = jnp.log(B + 1e-16)

    Bo = B[:, o].T  # (T, S)
    first = (pi + Bo[0]) if is_log else (pi * Bo[0])

    def step(prev, bo):
        if is_log:
            cand = prev[:, None] + A  # (S_prev, S)
            cur = jnp.max(cand, axis=0) + bo
        else:
            cand = prev[:, None] * A
            cur = jnp.max(cand, axis=0) * bo
        return cur, cur

    _, rest = jax.lax.scan(step, first, Bo[1:])
    probs = jnp.concatenate([first[None], rest], axis=0)  # (T, S)
    s_arr = jnp.argmax(probs, axis=-1)
    prob = probs[-1, s_arr[-1]]
    return s_arr, prob, probs
