"""DWT / WPT / SWT parity vs reference C goldens.

Per-wavelet DWT goldens are produced by driving the C ``dwtObj_*`` API
directly: the reference *Python wrapper* passes samplate where the C ctor
expects waveletType*, so it silently always decomposes with sym4 — we
follow the documented C API instead.
"""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.dwt import DWT, SWT, WPT
from audioflux_tpu.types import WaveletDiscreteType as W

CASES = [("sym4", W.SYM, 4, 0), ("db4", W.DB, 4, 0), ("coif3", W.COIF, 3, 0),
         ("haar", W.HAAR, 0, 0), ("bior3_5", W.BIOR, 3, 5),
         ("fk8", W.FK, 8, 0), ("dmey", W.DMEY, 0, 0)]


@pytest.mark.parametrize("name,wt,t1,t2", CASES)
def test_dwt(goldens, signals, name, wt, t1, t2):
    g = goldens("dwt")
    x = signals["chord"][:1024]
    obj = DWT(num=5, radix2_exp=10, samplate=32000, wavelet_type=wt,
              t1=t1, t2=t2)
    coef, m = obj.dwt(x)
    assert_close_to_golden(coef, g[f"dwt_{name}_coef"], 5e-5,
                           f"dwt_{name}_coef")
    assert_close_to_golden(m, g[f"dwt_{name}_m"], 5e-5, f"dwt_{name}_m")


def test_wpt(goldens, signals):
    g = goldens("dwt")
    x = signals["chord"][:1024]
    obj = WPT(num=4, radix2_exp=10, samplate=32000, wavelet_type=W.SYM, t1=4)
    coef, m = obj.wpt(x)
    assert_close_to_golden(coef, g["wpt_coef"], 5e-5, "wpt_coef")
    assert_close_to_golden(m, g["wpt_m"], 5e-5, "wpt_m")


def test_swt(goldens, signals):
    g = goldens("dwt")
    x = signals["chord"][:1024]
    obj = SWT(num=4, fft_length=1024, wavelet_type=W.DB, t1=4)
    a, d = obj.swt(x)
    assert_close_to_golden(a, g["swt_a"], 5e-5, "swt_a")
    assert_close_to_golden(d, g["swt_d"], 5e-5, "swt_d")


def test_dwt_batched(signals):
    x = signals["chord"][:1024]
    obj = DWT(num=5, radix2_exp=10, samplate=32000)
    coef, m = obj.dwt(np.stack([x, 0.5 * x]))
    s_coef, s_m = obj.dwt(x)
    assert np.asarray(coef).shape == (2, 1024)
    np.testing.assert_allclose(np.asarray(coef)[0], np.asarray(s_coef),
                               rtol=1e-6)
