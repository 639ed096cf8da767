"""Streaming STFT tail-carry equals one-shot STFT (isContinue semantics)."""

import numpy as np

from audioflux_tpu.transforms.stft import STFT, StreamingSTFT
from audioflux_tpu.types import WindowType


def test_streaming_matches_oneshot(signals):
    x = signals["sine"][:20000]
    one = STFT(radix2_exp=10, window_type=WindowType.HANN, slide_length=256)
    full = np.asarray(one.stft(x))

    st = StreamingSTFT(radix2_exp=10, window_type=WindowType.HANN,
                       slide_length=256)
    cols = []
    for start in range(0, len(x), 3000):
        out = st.process(x[start:start + 3000])
        if out.shape[-1]:
            cols.append(out)
    stream = np.concatenate(cols, axis=-1)
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=1e-5)


def test_streaming_short_chunks(signals):
    x = signals["sine"][:5000]
    st = StreamingSTFT(radix2_exp=10, slide_length=256)
    outs = [st.process(x[i:i + 100]) for i in range(0, 5000, 100)]
    total = sum(o.shape[-1] for o in outs)
    assert total == (5000 - 1024) // 256 + 1
