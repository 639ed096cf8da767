"""Deep / DeepChroma spectrogram parity vs reference C goldens."""

import numpy as np

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.deep import (DeepChromaSpectrogram,
                                           DeepSpectrogram)


def test_deep(goldens):
    g = goldens("deep")
    dp = DeepSpectrogram(num=84, samplate=32000, radix2_exp=12)
    D = np.asarray(dp.spectrogram(g["in_x"]))
    assert D.shape == g["deep"].shape
    for ch in range(3):
        assert_close_to_golden(D[ch], g["deep"][ch], 5e-5, f"deep_ch{ch}")


def test_deep_orders(goldens):
    """Neighbor-channel layouts 2..4 vs the C (setDeepOrder)."""
    g = goldens("deep")
    for k in (2, 3, 4):
        dp = DeepSpectrogram(num=84, samplate=32000, radix2_exp=12)
        dp.set_deep_order(k)
        D = np.asarray(dp.spectrogram(g["in_x"]))
        ref = g[f"deep_o{k}"]
        assert D.shape == ref.shape
        for ch in range(ref.shape[0]):
            assert_close_to_golden(D[ch], ref[ch], 5e-5, f"deep_o{k}_ch{ch}")


def test_deep_chroma(goldens):
    g = goldens("deep")
    dc = DeepChromaSpectrogram(samplate=32000, radix2_exp=12)
    C = np.asarray(dc.spectrogram(g["in_x"]))
    assert_close_to_golden(C, g["deep_chroma"], 5e-5, "deep_chroma")


def test_deep_batched(goldens):
    g = goldens("deep")
    dp = DeepSpectrogram(num=48, samplate=32000, radix2_exp=11)
    x = g["in_x"][:8192]
    out = np.asarray(dp.spectrogram(np.stack([x, x])))
    single = np.asarray(dp.spectrogram(x))
    assert out.shape[0] == 2
    np.testing.assert_allclose(out[0], single, rtol=1e-6)
