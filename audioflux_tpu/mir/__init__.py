from audioflux_tpu.mir.hpss import HPSS, HPSSNMF
from audioflux_tpu.mir.onset import Onset, NoveltyParam
from audioflux_tpu.mir.pitch_yin import PitchYIN
from audioflux_tpu.mir.pitch import (
    PitchNCF, PitchCEP, PitchHPS, PitchLHS, PitchPEF,
)
from audioflux_tpu.mir.harmonic import Harmonic
from audioflux_tpu.mir.harmonic_ratio import HarmonicRatio
from audioflux_tpu.mir.time_stretch import TimeStretch, PitchShift
from audioflux_tpu.mir.pitch_stft import PitchSTFT
from audioflux_tpu.mir.pitch_ffp import PitchFFP
