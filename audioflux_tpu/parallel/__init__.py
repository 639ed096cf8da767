from audioflux_tpu.parallel.mesh import make_mesh
from audioflux_tpu.parallel.sharded import (
    sharded_spectrogram_fn, sharded_stft_fn, sharded_istft_fn,
)
from audioflux_tpu.parallel.sharded_full import (
    sharded_cwt_fn, sharded_pwt_fn, sharded_synsq_fn, sharded_wsst_fn,
    sharded_st_fn,
    sharded_fst_fn, sharded_nsgt_fn, sharded_cqt_fn, sharded_ccwt_fn,
    sharded_cst_fn, sharded_batch_fn, sharded_batch_map_fn,
)
from audioflux_tpu.parallel.features import sharded_spectral_stats_fn
from audioflux_tpu.parallel.runner import BatchRunner
from audioflux_tpu.parallel.pipeline import pipeline_chain_fn
from audioflux_tpu.parallel import distributed
