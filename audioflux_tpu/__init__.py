"""audioflux_tpu — a TPU-native audio analysis & feature extraction framework.

A from-scratch JAX/XLA/Pallas implementation of the full capability surface of
libAudioFlux/audioFlux (time–frequency transforms, filterbank spectrograms,
spectral/cepstral features, MIR algorithms), designed TPU-first:

- transforms are pure jitted functions over batched, framed audio tiles
- filterbanks/windows are precomputed constants applied via MXU einsums
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
)

from audioflux_tpu.transforms.stft import STFT
from audioflux_tpu.transforms.spectrogram import (
    Spectrogram,
    MelSpectrogram,
    BarkSpectrogram,
    ErbSpectrogram,
)
from audioflux_tpu.io.wave import (
    read, write, WaveReader, WaveWriter, chirp, convert_mono,
)
from audioflux_tpu import utils
from audioflux_tpu import parallel

__version__ = "0.1.0"
