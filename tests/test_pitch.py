"""Pitch family parity vs reference C goldens (NCF/CEP/HPS/LHS/PEF)."""

import numpy as np
import pytest

from audioflux_tpu.mir.pitch import (PitchCEP, PitchHPS, PitchLHS, PitchNCF,
                                     PitchPEF)

CASES = [("ncf", PitchNCF), ("cep", PitchCEP), ("hps", PitchHPS),
         ("lhs", PitchLHS), ("pef", PitchPEF)]


@pytest.mark.parametrize("name,cls", CASES)
def test_pitch(goldens, name, cls):
    g = goldens("pitch")
    obj = cls(samplate=32000, radix2_exp=12, slide_length=1024)
    fre = np.asarray(obj.pitch(g["in_tone"]))
    np.testing.assert_allclose(fre, g[name], atol=1e-3)


def test_pitch_batched(goldens):
    g = goldens("pitch")
    obj = PitchNCF(samplate=32000, radix2_exp=12, slide_length=1024)
    out = np.asarray(obj.pitch(np.stack([g["in_tone"], g["in_tone"]])))
    single = np.asarray(obj.pitch(g["in_tone"]))
    np.testing.assert_allclose(out[0], single)
