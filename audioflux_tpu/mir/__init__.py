from audioflux_tpu.mir.hpss import HPSS
from audioflux_tpu.mir.onset import Onset, NoveltyParam
from audioflux_tpu.mir.pitch_yin import PitchYIN
