"""Discrete HMM: forward/backward, Baum-Welch training, Viterbi decoding,
sampling.

Reference ``src/classic/hmm.c``: unscaled forward/backward recursions
(:606-656), per-cell gamma/ksi normalization (:544-604), train loop updating
(A, B, pi) until parameter deltas fall below ``error`` (:hmmObj_train).
The per-cell C loops are fully vectorized over (T, S, S) tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audioflux_tpu.classic.viterbi import viterbi

__all__ = ["HMM"]


def _forward(pi, A, Bo):
    def step(alpha, bo):
        a = (alpha @ A) * bo
        return a, a
    first = pi * Bo[0]
    _, rest = jax.lax.scan(step, first, Bo[1:])
    return jnp.concatenate([first[None], rest], axis=0)


def _backward(A, Bo):
    T, S = Bo.shape

    def step(beta, bo_next):
        b = A @ (bo_next * beta)
        return b, b
    last = jnp.ones((S,), Bo.dtype)
    _, rest = jax.lax.scan(step, last, Bo[1:][::-1])
    return jnp.concatenate([rest[::-1], last[None]], axis=0)


class HMM:
    """API mirrors ``python/audioflux/classic`` HMM usage (hmm.h:15-29)."""

    def __init__(self, s_length: int, n_length: int, seed: int = 0):
        self.s_length = s_length
        self.n_length = n_length
        rng = np.random.default_rng(seed)

        def row_stochastic(shape):
            m = rng.random(shape)
            return (m / m.sum(axis=-1, keepdims=True)).astype(np.float32)

        self.pi = row_stochastic((s_length,))
        self.A = row_stochastic((s_length, s_length))
        self.B = row_stochastic((s_length, n_length))

    def init(self, pi_arr, m_a_arr, m_b_arr):
        self.pi = np.asarray(pi_arr, np.float32)
        self.A = np.asarray(m_a_arr, np.float32)
        self.B = np.asarray(m_b_arr, np.float32)

    # ------------------------------------------------------------------
    def predict(self, o_arr) -> float:
        """Observation-sequence likelihood via the forward recursion."""
        o = np.asarray(o_arr, np.int64)
        Bo = jnp.asarray(self.B)[:, o].T
        alpha = _forward(jnp.asarray(self.pi), jnp.asarray(self.A), Bo)
        return float(jnp.sum(alpha[-1]))

    def decode(self, o_arr):
        """(state path, probability) via Viterbi."""
        s, p, probs = viterbi(self.pi, self.A, self.B, o_arr)
        return np.asarray(s), float(p)

    # ------------------------------------------------------------------
    def train(self, o_arr, max_iter: int = 100, error: float = 1e-3):
        """Baum-Welch reestimation on one observation sequence."""
        o = np.asarray(o_arr, np.int64)
        T = len(o)
        pi = jnp.asarray(self.pi)
        A = jnp.asarray(self.A)
        B = jnp.asarray(self.B)
        o_j = jnp.asarray(o)
        onehot = jax.nn.one_hot(o_j, self.n_length, dtype=jnp.float32)

        @jax.jit
        def em(pi, A, B):
            Bo = B[:, o_j].T  # (T, S)
            alpha = _forward(pi, A, Bo)
            beta = _backward(A, Bo)
            ab = alpha * beta  # (T, S)
            gamma = ab / jnp.sum(ab, axis=-1, keepdims=True)
            # ksi[t,i,j] ~ alpha[t,i] A[i,j] Bo[t+1,j] beta[t+1,j]
            num = (alpha[:-1, :, None] * A[None]
                   * (Bo[1:] * beta[1:])[:, None, :])
            ksi = num / jnp.sum(num, axis=(1, 2), keepdims=True)
            A_new = jnp.sum(ksi, axis=0) / jnp.sum(gamma[:-1], axis=0)[:, None]
            B_new = (gamma.T @ onehot) / jnp.sum(gamma, axis=0)[:, None]
            pi_new = gamma[0]
            return pi_new, A_new, B_new

        for _ in range(max_iter):
            pi_n, A_n, B_n = em(pi, A, B)
            d = max(float(jnp.linalg.norm(pi_n - pi)),
                    float(jnp.linalg.norm(A_n - A)),
                    float(jnp.linalg.norm(B_n - B)))
            pi, A, B = pi_n, A_n, B_n
            if d < error:
                break
        self.pi = np.asarray(pi)
        self.A = np.asarray(A)
        self.B = np.asarray(B)

    # ------------------------------------------------------------------
    def generate(self, t_length: int, seed: int = 0):
        """Sample (observations, states) from the model."""
        rng = np.random.default_rng(seed)
        states = np.zeros(t_length, np.int64)
        obs = np.zeros(t_length, np.int64)
        s = rng.choice(self.s_length, p=self.pi / self.pi.sum())
        for t in range(t_length):
            states[t] = s
            obs[t] = rng.choice(self.n_length,
                                p=self.B[s] / self.B[s].sum())
            s = rng.choice(self.s_length, p=self.A[s] / self.A[s].sum())
        return obs, states
