from audioflux_tpu.classic.nmf import NMF, nmf
from audioflux_tpu.classic.hmm import HMM
from audioflux_tpu.classic.viterbi import viterbi
