"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from audioflux_tpu.ops.filter import median_filter
from audioflux_tpu.ops.pallas_median import median_filter_last_axis


@pytest.mark.parametrize("order", [5, 21, 31])
def test_pallas_median_matches_jnp(order):
    rng = np.random.default_rng(0)
    x = rng.random((37, 513)).astype(np.float32)
    a = np.asarray(median_filter_last_axis(x, order, interpret=True))
    b = np.asarray(median_filter(x, order, axis=-1))
    np.testing.assert_array_equal(a, b)


def test_pallas_median_batched():
    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 200)).astype(np.float32)
    a = np.asarray(median_filter_last_axis(x, 9, interpret=True))
    b = np.asarray(median_filter(x, 9, axis=-1))
    np.testing.assert_array_equal(a, b)
