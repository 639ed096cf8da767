"""STFT/ISTFT parity vs reference goldens, incl. padding modes."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.stft import STFT
from audioflux_tpu.types import PaddingModeType, PaddingPositionType, WindowType


def _make(pad=None):
    st = STFT(radix2_exp=11, window_type=WindowType.HANN, slide_length=512)
    if pad is not None:
        st.enable_padding(True)
        st.set_padding(*pad)
    return st


def test_stft_matches_reference(goldens, signals):
    g = goldens("stft")
    st = _make()
    D = np.asarray(st.stft(signals["sine"]))
    ref = g["stft_re"] + 1j * g["stft_im"]
    assert_close_to_golden(D.real, ref.real, 5e-5, "stft real")
    assert_close_to_golden(D.imag, ref.imag, 5e-5, "stft imag")


@pytest.mark.parametrize("tag,pos,mode", [
    ("center_const", PaddingPositionType.CENTER, PaddingModeType.CONSTANT),
    ("center_reflect", PaddingPositionType.CENTER, PaddingModeType.REFLECT),
    ("center_wrap", PaddingPositionType.CENTER, PaddingModeType.WRAP),
    ("right_reflect", PaddingPositionType.RIGHT, PaddingModeType.REFLECT),
    ("left_reflect", PaddingPositionType.LEFT, PaddingModeType.REFLECT),
])
def test_stft_padded(goldens, signals, tag, pos, mode):
    g = goldens("stft")
    st = _make(pad=(pos, mode, 0.0, 0.0))
    D = np.asarray(st.stft(signals["sine"]))
    assert_close_to_golden(D.real, g[f"stft_{tag}_re"], 5e-5, f"{tag} real")
    assert_close_to_golden(D.imag, g[f"stft_{tag}_im"], 5e-5, f"{tag} imag")


def test_istft_matches_reference(goldens, signals):
    g = goldens("stft")
    st = _make()
    D = st.stft(signals["sine"])
    y_w = np.asarray(st.istft(D, method_type=0))
    y_o = np.asarray(st.istft(D, method_type=1))
    assert_close_to_golden(y_w, g["istft_w"], 1e-4, "istft weighted")
    # plain OLA divides the first/last fft_length samples by near-zero window
    # sums (~2e-6), amplifying float32 FFT noise ~1e6x — compare interior
    # tightly, edges loosely
    n = 2048
    assert_close_to_golden(y_o[n:-n], g["istft_ola"][n:-n], 1e-4,
                           "istft ola interior")
    assert_close_to_golden(y_o, g["istft_ola"], 5e-2, "istft ola edges")


def test_roundtrip_reconstruction(signals):
    """ISTFT(STFT(x)) should reconstruct the interior of x closely."""
    st = _make()
    x = signals["sine"]
    y = np.asarray(st.istft(st.stft(x)))
    n = min(len(y), len(x))
    interior = slice(2048, n - 2048)
    err = np.abs(y[interior] - x[interior]).max()
    assert err < 1e-3, f"roundtrip err {err}"


def test_multichannel_batch(signals):
    st = _make()
    x = signals["sine"]
    batch = np.stack([x, -x])
    D = np.asarray(st.stft(batch))
    assert D.shape[0] == 2
    np.testing.assert_allclose(D[1], -D[0], rtol=1e-6, atol=1e-6)
