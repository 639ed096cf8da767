"""Spectral feature set over a BFT spectrogram ("Spectral Features")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220
import numpy as np
import audioflux_tpu as af
from audioflux_tpu.types import SpectralDataType, SpectralFilterBankScaleType

audio_arr = sample_220()
bft_obj = af.BFT(num=128, radix2_exp=12, samplate=SR, slide_length=1024,
                 scale_type=SpectralFilterBankScaleType.LINEAR,
                 data_type=SpectralDataType.POWER)
spec_arr = np.abs(np.asarray(bft_obj.bft(audio_arr)))

spectral_obj = af.Spectral(num=bft_obj.num, fre_band_arr=bft_obj.get_fre_band_arr())
spectral_obj.set_time_length(spec_arr.shape[-1])
print("centroid:", np.asarray(spectral_obj.centroid(spec_arr))[:4])
print("entropy: ", np.asarray(spectral_obj.entropy(spec_arr))[:4])
print("flux:    ", np.asarray(spectral_obj.flux(spec_arr))[:4])
print("rms:     ", np.asarray(spectral_obj.rms(spec_arr))[:4])
