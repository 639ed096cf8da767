from audioflux_tpu.track.tune_track import TuneTrack
