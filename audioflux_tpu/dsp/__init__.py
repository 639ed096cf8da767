from audioflux_tpu.dsp.resample import Resample, WindowResample, resample
from audioflux_tpu.dsp.czt import CZT, czt
from audioflux_tpu.dsp.xcorr import Xcorr, XcorrNormalType, xcorr
from audioflux_tpu.dsp.hilbert import Hilbert, hilbert
from audioflux_tpu.dsp.dct import DCT, dct, idct
from audioflux_tpu.dsp.phase_vocoder import phase_vocoder
from audioflux_tpu.dsp.filter_design import (
    FilterBandType, fir1, fir2, smooth1, filter_, filtfilt,
    freqz_ba, freqz_sos,
)
from audioflux_tpu.dsp.conv import ConvModeType, conv
