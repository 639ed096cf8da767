from audioflux_tpu.io.wave import read, write, WaveReader, WaveWriter, chirp, convert_mono
