"""Fused unwrap+diff kernel (ops/pallas_unwrap.py) vs the XLA cumsum
formulation in transforms/synsq.py.  Interpret mode on CPU; the TPU path
is the same program.

Contract: wrap counts agree exactly; per-cell diffs may differ by up to
~1 ulp of the *unwrapped phase* magnitude (FMA contraction of the final
x + c*2pi — see the module docstring), the documented knife-edge class.
"""

import numpy as np
import jax.numpy as jnp

from audioflux_tpu.ops.pallas_unwrap import supports, unwrap_diff
from audioflux_tpu.transforms.synsq import _c_unwrap


def _ref(x):
    ph = np.asarray(_c_unwrap(jnp.asarray(x)))
    e = np.zeros_like(x)
    e[..., 1:] = ph[..., 1:] - ph[..., :-1]
    return ph, e


def test_unwrap_diff_matches_cumsum():
    rng = np.random.default_rng(0)
    # drifting + wrapping phases: accumulate far past 2pi so the carry
    # across time blocks matters
    t = np.cumsum(rng.uniform(-2.5, 3.0, (24, 1024)), axis=-1)
    x = np.float32(np.arctan2(np.sin(t), np.cos(t)))
    got = np.asarray(unwrap_diff(jnp.asarray(x), interpret=True))
    ph, want = _ref(x)
    # identical wrap counts: diffs agree to 2 ulp of the unwrapped phase
    tol = 2 * np.finfo(np.float32).eps * np.abs(ph).max()
    assert np.abs(got - want).max() <= tol
    # and a wrong wrap count anywhere would be a 2pi-sized error
    assert np.abs(got - want).max() < 1.0
    # most cells bit-equal (FMA contraction only moves knife-edge ulps)
    assert (got == want).mean() > 0.5
    assert got[..., 0].max() == got[..., 0].min() == 0.0


def test_unwrap_diff_steady_tone():
    # steady near-pi increments: the historical knife-edge case
    x = np.float32(
        np.angle(np.exp(1j * np.outer(np.ones(8) * 3.1, np.arange(512)))))
    got = np.asarray(unwrap_diff(jnp.asarray(x), interpret=True))
    ph, want = _ref(x)
    tol = 2 * np.finfo(np.float32).eps * np.abs(ph).max()
    assert np.abs(got - want).max() <= tol


def test_supports_gate():
    assert supports(1344, 32768)
    assert not supports(12, 32768)   # rows not a multiple of 8
    assert not supports(8, 100)      # no 128-lane block divides T
