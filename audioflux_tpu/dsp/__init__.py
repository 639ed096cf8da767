from audioflux_tpu.dsp.resample import Resample, WindowResample, resample
