"""Window parity vs the reference C window_calFFTWindow golden outputs."""

import numpy as np
import pytest

from audioflux_tpu.ops.window import get_fft_window, get_window
from audioflux_tpu.types import WindowType

ALL_TYPES = list(WindowType)


@pytest.mark.parametrize("wt", ALL_TYPES)
@pytest.mark.parametrize("length", [256, 1024, 255])
def test_fft_window_matches_reference(goldens, wt, length):
    g = goldens("windows")
    ref = g[f"w{int(wt)}_{length}"]
    ours = get_fft_window(wt, length)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-6,
                               err_msg=f"{wt.name} length={length}")


def test_window_length_one():
    for wt in ALL_TYPES:
        w = get_window(wt, 1)
        assert w.shape == (1,) and w[0] == 1.0


def test_periodic_is_truncated_symmetric():
    for wt in (WindowType.HANN, WindowType.HAMM, WindowType.BLACKMAN):
        sym = get_window(wt, 257)
        per = get_window(wt, 256, periodic=True)
        np.testing.assert_allclose(per, sym[:256], atol=1e-7)
