"""PitchFFP vs reference C golden (harmonic material).

The full _queue strategy engine is not ported yet (see pitch_ffp.py
docstring); on harmonic signals both implementations agree closely.
"""

import numpy as np

from audioflux_tpu.mir.pitch_ffp import PitchFFP


def test_pitch_ffp(goldens):
    g = goldens("pitch_ffp")
    p = PitchFFP(samplate=32000, radix2_exp=12, slide_length=1024)
    fre, db = p.pitch(g["x"])
    err = np.abs(fre - g["fre"])
    assert np.median(err) < 0.1
    assert err.max() < 1.0
