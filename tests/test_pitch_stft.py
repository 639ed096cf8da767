"""PitchSTFT + trist parity vs reference C golden."""

import numpy as np

from audioflux_tpu.mir.pitch_stft import PitchSTFT


def test_pitch_stft(goldens):
    g = goldens("pitch_stft")
    p = PitchSTFT(samplate=32000, radix2_exp=12, slide_length=1024)
    fre, db = p.pitch(g["x"])
    np.testing.assert_allclose(fre, g["fre"], atol=1e-3)
    np.testing.assert_allclose(db, g["db"], atol=1e-4)


def test_trist_fuzz_against_rules():
    # harmonic stacks resolve to the fundamental
    from audioflux_tpu.mir._trist import trist
    f0 = 196.0
    corr = np.array([2 * f0, 3 * f0, 4 * f0, 5 * f0, 6 * f0, 7 * f0])
    db = np.linspace(-10, -40, 6)
    z = np.zeros(6)
    flag, fre = trist(corr, db, z, z.astype(int), corr, db, z,
                      z.astype(int), 3, 3)
    assert flag == 1
    assert abs(fre - f0) < 2.0
