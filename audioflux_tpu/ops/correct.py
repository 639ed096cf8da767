"""Spectral peak frequency correction for rect/hann/hamm windows.

Reference ``src/dsp/flux_correct.c``: given a local peak (left, cur, right)
of the magnitude spectrum, estimate the fractional bin offset ``det`` and
the corrected amplitude. The hamm variant runs 8 fixed-point iterations.
All functions are vectorized element-wise (inputs broadcast).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from audioflux_tpu.types import WindowType

__all__ = ["correct_rect", "correct_hann", "correct_hamm", "correct_fn"]

_EPS = 1e-10


def _pick(cur, left, right):
    cond = right >= left
    y1 = jnp.where(cond, cur, left)
    y2 = jnp.where(cond, right, cur)
    y2 = jnp.maximum(y2, _EPS)
    return y1, y2, cond


def _amp(cur, det, shape_fn):
    n = jnp.where(det >= 0, jnp.floor(det), jnp.ceil(det))
    s = det - n
    s = jnp.where(jnp.abs(s) < 1e-8, 1e-8, s)
    c1 = n + s
    c2 = np.pi * c1 / jnp.sin(np.pi * c1)
    return shape_fn(cur, c1, c2)


def correct_rect(cur, left, right):
    y1, y2, _ = _pick(cur, left, right)
    v1 = y1 / y2
    v2 = jnp.maximum(1 + v1, _EPS)
    det = 1.0 / v2
    det = jnp.where(y1 < y2, det - 1.0, det)
    value = _amp(cur, det, lambda c, c1, c2: c * c2)
    return det, value


def correct_hann(cur, left, right):
    y1, y2, _ = _pick(cur, left, right)
    v1 = y1 / y2
    v2 = jnp.maximum(1 + v1, _EPS)
    det = (2.0 - v1) / v2
    det = jnp.where(y1 < y2, det - 1.0, det)
    value = _amp(cur, det,
                 lambda c, c1, c2: c * c2 * (1 - c1 * c1) * 2.0)
    return det, value


def correct_hamm(cur, left, right):
    y1, y2, _ = _pick(cur, left, right)
    c1 = -27.0 / 4.0
    v1 = y1 / y2
    det = -(2.0 - v1) / (1.0 + v1)
    for _ in range(8):
        v2 = (det * det + c1) / ((det + 1.0) ** 2 + c1)
        det = (v1 - 2.0 * v2) / (v1 + v2)
    det = -det
    det = jnp.where(y1 < y2, det - 1.0, det)
    value = _amp(cur, det,
                 lambda c, cc, c2: c * c2 * (1 - cc * cc)
                 / (0.54 - 0.08 * cc * cc))
    return det, value


def correct_fn(window_type: WindowType):
    w = WindowType(window_type)
    if w == WindowType.HANN:
        return correct_hann
    if w == WindowType.HAMM:
        return correct_hamm
    return correct_rect
