"""Harmonic (salience counting) parity vs reference C golden."""

import numpy as np

from audioflux_tpu.mir.harmonic import Harmonic


def test_harmonic_count(goldens):
    g = goldens("harmonic")
    h = Harmonic(samplate=32000, radix2_exp=12)
    counts = h.harmonic_count(g["x"], 100.0, 2000.0)
    np.testing.assert_array_equal(counts, g["counts"])
