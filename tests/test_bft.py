"""Reassign + BFT parity vs reference C goldens."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.bft import BFT
from audioflux_tpu.transforms.reassign import Reassign
from audioflux_tpu.types import (ReassignType, SpectralDataType,
                                 SpectralFilterBankScaleType as S,
                                 WindowType)


@pytest.fixture(scope="module")
def x(signals):
    return signals["chord"][:16000]


def test_reassign_all(goldens, x):
    g = goldens("bft")
    rs = Reassign(radix2_exp=11, samplate=32000, window_type=WindowType.HANN,
                  slide_length=512, re_type=ReassignType.ALL)
    D = np.asarray(rs.reassign(x))
    ref = g["reassign_re"] + 1j * g["reassign_im"]
    assert_close_to_golden(D.real, ref.real, 2e-4, "reassign_re")
    assert_close_to_golden(D.imag, ref.imag, 2e-4, "reassign_im")


def test_reassign_fre(goldens, x):
    g = goldens("bft")
    rs = Reassign(radix2_exp=11, samplate=32000, window_type=WindowType.HANN,
                  slide_length=512, re_type=ReassignType.FRE)
    D = np.asarray(rs.reassign(x))
    ref = g["reassign_fre_re"] + 1j * g["reassign_fre_im"]
    assert_close_to_golden(D.real, ref.real, 2e-4, "reassign_fre_re")
    assert_close_to_golden(D.imag, ref.imag, 2e-4, "reassign_fre_im")


def test_bft_mel_mag(goldens, x):
    g = goldens("bft")
    bft = BFT(num=128, radix2_exp=11, samplate=32000, slide_length=512,
              scale_type=S.MEL, data_type=SpectralDataType.MAG)
    out = np.abs(np.asarray(bft.bft(x, result_type=1)))
    assert_close_to_golden(out, g["bft_mel_mag"], 5e-5, "bft_mel_mag")


def test_bft_linear_complex(goldens, x):
    g = goldens("bft")
    bft = BFT(num=1025, radix2_exp=11, samplate=32000, slide_length=512,
              scale_type=S.LINEAR, data_type=SpectralDataType.POWER)
    C = np.asarray(bft.bft(x, result_type=0))
    ref = g["bft_lin_cpx_re"] + 1j * g["bft_lin_cpx_im"]
    assert_close_to_golden(C.real, ref.real, 5e-5, "bft_lin_cpx_re")
    assert_close_to_golden(C.imag, ref.imag, 5e-5, "bft_lin_cpx_im")


def test_bft_mel_reassigned(goldens, x):
    g = goldens("bft")
    bft = BFT(num=128, radix2_exp=11, samplate=32000, slide_length=512,
              scale_type=S.MEL, data_type=SpectralDataType.POWER,
              is_reassign=True)
    out = np.abs(np.asarray(bft.bft(x, result_type=1)))
    assert_close_to_golden(out, g["bft_mel_rea"], 2e-4, "bft_mel_rea")


def test_bft_batched(goldens, x):
    bft = BFT(num=128, radix2_exp=11, samplate=32000, slide_length=512,
              scale_type=S.MEL, data_type=SpectralDataType.MAG)
    xb = np.stack([x, 0.5 * x])
    out = np.asarray(bft.bft(xb, result_type=1))
    single = np.asarray(bft.bft(x))
    assert out.shape == (2, 128, 28)
    np.testing.assert_allclose(out[0], single, rtol=1e-6)


def test_bft_temporal(x):
    bft = BFT(num=128, radix2_exp=11, samplate=32000, slide_length=512,
              scale_type=S.MEL, is_temporal=True)
    bft.bft(x, result_type=1)
    e, r, z = bft.get_temporal_data()
    assert e.shape == r.shape == z.shape


def test_reassign_batched(x):
    rs = Reassign(radix2_exp=11, samplate=32000, window_type=WindowType.HANN,
                  slide_length=512, re_type=ReassignType.ALL)
    single = np.asarray(rs.reassign(x))
    batch = np.asarray(rs.reassign(np.stack([x, x])))
    np.testing.assert_allclose(batch[0], single, atol=1e-6)
    np.testing.assert_allclose(batch[1], single, atol=1e-6)


def test_bft_fused_matches_exact():
    from audioflux_tpu.transforms.bft import BFT
    from audioflux_tpu.types import (SpectralDataType,
                                     SpectralFilterBankScaleType)
    import numpy as np
    bft = BFT(num=64, radix2_exp=11, samplate=32000, slide_length=512,
              scale_type=SpectralFilterBankScaleType.MEL,
              data_type=SpectralDataType.POWER)
    rng = np.random.default_rng(3)
    x = (0.2 * rng.standard_normal((2, 16 * 512 + 1536))).astype(np.float32)
    ref = np.asarray(bft.bft(x, result_type=1))
    spec, cc = bft.bft_fused(x, cc_num=5, tile=8)
    spec = np.asarray(spec)
    assert spec.shape == ref.shape
    assert np.max(np.abs(spec - ref)) <= 1e-4 * np.max(np.abs(ref))
    assert np.asarray(cc).shape == (2, 5, ref.shape[-1])


def test_bft_fused_linear_ragged_frames():
    # LINEAR scale (exact 0/1 bin-selection bank) + a frame count that is
    # not a tile multiple (auto-pad + slice-back inside bft_fused)
    from audioflux_tpu.transforms.bft import BFT
    from audioflux_tpu.types import (SpectralDataType,
                                     SpectralFilterBankScaleType)
    import numpy as np
    bft = BFT(num=513, radix2_exp=10, samplate=32000, slide_length=256,
              scale_type=SpectralFilterBankScaleType.LINEAR,
              data_type=SpectralDataType.POWER)
    rng = np.random.default_rng(7)
    n = 13 * 256 + 1024 + 128          # 14 frames + ragged tail
    x = (0.2 * rng.standard_normal((2, n))).astype(np.float32)
    ref = np.asarray(bft.bft(x, result_type=1))
    spec, _ = bft.bft_fused(x, cc_num=0, tile=8)
    spec = np.asarray(spec)
    assert spec.shape == ref.shape == (2, 513, 14)
    assert np.max(np.abs(spec - ref)) <= 1e-4 * np.max(np.abs(ref))
    # non-multiple-of-8 tile request is quantized, not crashed (the tile
    # picker must never emit a misaligned tile or raise StopIteration)
    spec2, _ = bft.bft_fused(x, cc_num=0, tile=100)
    assert np.array_equal(np.asarray(spec2), spec) or \
        np.max(np.abs(np.asarray(spec2) - ref)) <= 1e-4 * np.max(np.abs(ref))
