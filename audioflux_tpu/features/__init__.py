from audioflux_tpu.features.spectral import Spectral
