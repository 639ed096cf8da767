"""audioflux_tpu — a TPU-native audio analysis & feature extraction framework.

A from-scratch JAX/XLA/Pallas implementation of the full capability surface of
libAudioFlux/audioFlux (time–frequency transforms, filterbank spectrograms,
spectral/cepstral features, MIR algorithms), designed TPU-first:

- transforms are pure jitted functions over batched, framed audio tiles
- filterbanks/windows are precomputed constants applied via MXU einsums
- scatter transforms (reassign/synchrosqueeze) use flat per-batch scatter-adds
- long recordings shard across a device mesh by frame-blocks with
  collective-permute halo exchange (see ``audioflux_tpu.parallel``)

Numerical contract: outputs match the reference C library (float32) within
float tolerance; framing/window alignment is bit-exact.
"""

from audioflux_tpu.types import (
    WindowType,
    SpectralDataType,
    SpectralFilterBankScaleType,
    SpectralFilterBankStyleType,
    SpectralFilterBankNormalType,
    SpectralNoveltyMethodType,
    SpectralNoveltyDataType,
    ChromaDataNormalType,
    CepstralRectifyType,
    CepstralEnergyType,
    PaddingPositionType,
    PaddingModeType,
    WaveletContinueType,
    WaveletDiscreteType,
    PitchType,
    NoveltyType,
    ReassignType,
    ResampleQualityType,
)

# transforms
from audioflux_tpu.transforms.stft import STFT, StreamingSTFT
from audioflux_tpu.transforms.spectrogram import (
    Spectrogram, MelSpectrogram, BarkSpectrogram, ErbSpectrogram,
)
from audioflux_tpu.transforms.deep import DeepSpectrogram, DeepChromaSpectrogram
from audioflux_tpu.transforms.bft import BFT
from audioflux_tpu.transforms.cqt import CQT, VQT, SimpleCQT
from audioflux_tpu.transforms.cwt import CWT
from audioflux_tpu.transforms.pwt import PWT
from audioflux_tpu.transforms.nsgt import NSGT, NSGTFilterBankType
from audioflux_tpu.transforms.st import ST
from audioflux_tpu.transforms.fst import FST
from audioflux_tpu.transforms.dwt import DWT, WPT, SWT
from audioflux_tpu.transforms.reassign import Reassign
from audioflux_tpu.transforms.synsq import Synsq
from audioflux_tpu.transforms.wsst import WSST
from audioflux_tpu.transforms.cepstrogram import Cepstrogram
from audioflux_tpu.transforms.temporal import Temporal

# features
from audioflux_tpu.features.spectral import Spectral
from audioflux_tpu.features.xxcc import XXCC
from audioflux_tpu.features.deconv import Deconv
from audioflux_tpu.features.extractor import FeatureExtractor, FeatureResult

# MIR
from audioflux_tpu.mir.pitch_yin import PitchYIN
from audioflux_tpu.mir.pitch_stft import PitchSTFT
from audioflux_tpu.mir.pitch_ffp import PitchFFP
from audioflux_tpu.mir.pitch import (
    PitchNCF, PitchCEP, PitchHPS, PitchLHS, PitchPEF,
)
from audioflux_tpu.mir.hpss import HPSS, HPSSNMF
from audioflux_tpu.mir.onset import Onset, NoveltyParam
from audioflux_tpu.mir.harmonic import Harmonic
from audioflux_tpu.mir.harmonic_ratio import HarmonicRatio
from audioflux_tpu.mir.time_stretch import TimeStretch, PitchShift

# tracking
from audioflux_tpu.track import TuneTrack

# classic ML
from audioflux_tpu.classic import NMF, HMM, nmf, viterbi

# dsp
from audioflux_tpu.dsp import (
    Resample, WindowResample, resample, CZT, czt, Xcorr, XcorrNormalType,
    xcorr, Hilbert, hilbert, DCT, dct, idct, phase_vocoder,
)

# io / one-shot / subpackages
from audioflux_tpu.io.wave import (
    read, write, WaveReader, WaveWriter, chirp, convert_mono,
)
from audioflux_tpu.core import (
    linear_spectrogram, mel_spectrogram, bark_spectrogram, erb_spectrogram,
    mfcc, bfcc, gtcc, cqcc, cqt, vqt,
    chroma_linear, chroma_octave, chroma_cqt,
)
from audioflux_tpu import utils
from audioflux_tpu import parallel
from audioflux_tpu import display
from audioflux_tpu import observe

__version__ = "0.1.0"
