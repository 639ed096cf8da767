"""PWT parity vs reference C goldens."""

import numpy as np

from tests.conftest import assert_close_to_golden

from audioflux_tpu.transforms.pwt import PWT
from audioflux_tpu.types import SpectralFilterBankScaleType as S


def test_pwt_octave(goldens, signals):
    g = goldens("pwt")
    obj = PWT(num=84, radix2_exp=12, samplate=32000, scale_type=S.OCTAVE)
    np.testing.assert_allclose(obj.get_fre_band_arr(), g["oct_fre"],
                               rtol=1e-5, atol=1e-2)
    C = np.asarray(obj.pwt(signals["chord"][:4096]))
    ref = g["oct_re"] + 1j * g["oct_im"]
    assert_close_to_golden(C.real, ref.real, 2e-4, "oct_re")
    assert_close_to_golden(C.imag, ref.imag, 2e-4, "oct_im")


def test_pwt_mel(goldens, signals):
    g = goldens("pwt")
    obj = PWT(num=64, radix2_exp=12, samplate=32000, scale_type=S.MEL)
    C = np.asarray(obj.pwt(signals["chord"][:4096]))
    ref = g["mel_re"] + 1j * g["mel_im"]
    assert_close_to_golden(C.real, ref.real, 2e-4, "mel_re")
    assert_close_to_golden(C.imag, ref.imag, 2e-4, "mel_im")


def test_pwt_kernel_path_interpret(signals):
    """The fused-kernel route (TPU-gated in production) reproduces the jnp
    path on the REAL pseudo-auditory bank, in Pallas interpret mode —
    including the per-band support slicing (auditory bands do not start
    at row 0, so slicing only trims tails; correctness must hold)."""
    import jax.numpy as jnp
    from audioflux_tpu.ops.pallas_cwt import cwt_ifft_bank, supports
    from audioflux_tpu.ops import fft as afft

    obj = PWT(num=32, radix2_exp=13, samplate=32000, scale_type=S.MEL)
    assert obj._row_h is not None
    x = np.asarray(signals["chord"][:8192], np.float32)[None]
    p = obj.pad_length
    xp = np.pad(x, [(0, 0), (p, p)], mode="symmetric")
    w_len = xp.shape[-1]
    assert supports(w_len, p, obj.data_length)
    F = afft.fft(jnp.asarray(xp), axis=-1)
    got = np.asarray(cwt_ifft_bank(F, jnp.asarray(obj._bank), pad=p,
                                   length=obj.data_length,
                                   row_h=obj._row_h, interpret=True))
    want = np.asarray(obj.pwt(x))  # jnp path on CPU
    peak = np.abs(want).max()
    assert np.abs(got - want).max() <= 2e-5 * peak
