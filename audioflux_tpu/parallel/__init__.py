from audioflux_tpu.parallel.mesh import make_mesh
from audioflux_tpu.parallel.sharded import (
    sharded_spectrogram_fn, sharded_stft_fn, sharded_istft_fn,
)
