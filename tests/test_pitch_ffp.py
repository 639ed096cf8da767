"""PitchFFP vs reference C golden (harmonic material).

The engine is fully ported and frame-exact (see
test_pitch_ffp_fuzz.py for the randomized oracle rig); this golden
pins one harmonic fixture without needing the compiled reference.
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
