"""Pitch estimation: YIN on a 220 Hz tone ("Pitch Estimate")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220
import numpy as np
import audioflux_tpu as af

audio_arr = sample_220()
pitch_obj = af.PitchYIN(samplate=SR, radix2_exp=12, slide_length=1024)
fre_arr, value_arr = pitch_obj.pitch(audio_arr)
fre = np.asarray(fre_arr)
print("median f0:", float(np.median(fre[fre > 0])), "Hz (expect ~220)")
