"""Fused CWT IFFT kernel (ops/pallas_cwt.py) vs the jnp reference path.

Runs in Pallas interpret mode on CPU; the real-TPU path is additionally
accuracy-gated inside bench.py before any timing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflux_tpu.ops.pallas_cwt import cwt_ifft_bank, supports


@pytest.mark.parametrize("n,length", [(16384, 8192), (32768, 16384)])
def test_cwt_ifft_bank_matches_jnp(n, length):
    pad = length // 2
    assert supports(n, pad, length)
    rng = np.random.default_rng(0)
    F = (rng.standard_normal((2, n))
         + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    bank = np.abs(rng.standard_normal((3, n))).astype(np.float32)
    want = np.fft.ifft(bank[None] * F[:, None, :], axis=-1)[..., pad:pad + length]
    got = np.asarray(cwt_ifft_bank(jnp.asarray(F), jnp.asarray(bank),
                                   pad=pad, length=length, interpret=True))
    peak = np.abs(want).max()
    assert np.abs(got - want).max() <= 2e-5 * peak


def test_cwt_ifft_bank_det_rotation():
    n, length = 16384, 8192
    pad = length // 2
    rng = np.random.default_rng(1)
    F = (rng.standard_normal((1, n))
         + 1j * rng.standard_normal((1, n))).astype(np.complex64)
    bank = np.abs(rng.standard_normal((2, n))).astype(np.float32)
    want = 1j * np.fft.ifft(bank[None] * F[:, None, :],
                            axis=-1)[..., pad:pad + length]
    got = np.asarray(cwt_ifft_bank(jnp.asarray(F), jnp.asarray(bank),
                                   pad=pad, length=length, det=True,
                                   interpret=True))
    assert np.abs(got - want).max() <= 2e-5 * np.abs(want).max()


def test_cwt_ifft_bank_support_buckets():
    # analytic-style sparse bank: contiguous bumps [1, hi_j] of growing
    # width -> several row-count buckets; support slicing must be exact
    from audioflux_tpu.ops.pallas_cwt import band_row_counts
    n, length = 16384, 8192
    pad = length // 2
    rng = np.random.default_rng(2)
    F = (rng.standard_normal((2, n))
         + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    bank = np.zeros((6, n), np.float32)
    for j, hi in enumerate([40, 300, 700, 1500, 3000, 6000]):
        bank[j, 1:hi] = np.abs(rng.standard_normal(hi - 1))
    row_h = band_row_counts(bank, n)
    assert row_h[0] == 8 and row_h[-1] > row_h[0]
    want = np.fft.ifft(bank[None] * F[:, None, :],
                       axis=-1)[..., pad:pad + length]
    got = np.asarray(cwt_ifft_bank(jnp.asarray(F), jnp.asarray(bank),
                                   pad=pad, length=length, row_h=row_h,
                                   interpret=True))
    assert np.abs(got - want).max() <= 2e-5 * np.abs(want).max()
    # sliced == unsliced to a few ulps: only exact zeros are dropped, but
    # the shorter contraction uses a different f32 summation tree
    full = np.asarray(cwt_ifft_bank(jnp.asarray(F), jnp.asarray(bank),
                                    pad=pad, length=length,
                                    interpret=True))
    assert np.abs(got - full).max() <= 1e-6 * np.abs(full).max()


def test_supports_gate():
    assert not supports(8192, 2048, 4096)      # below the size floor
    assert not supports(16384 + 4, 8192, 8192)  # not a power of two
    assert supports(65536, 16384, 32768)        # the bench config
