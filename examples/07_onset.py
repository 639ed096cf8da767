"""Onset detection via spectral-flux novelty ("Onset Detection")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220
import numpy as np
import audioflux_tpu as af
from audioflux_tpu.types import NoveltyType, SpectralDataType, \
    SpectralFilterBankScaleType

# three plucks
x = np.concatenate([sample_220(0.4), sample_220(0.4), sample_220(0.4)])
bft_obj = af.BFT(num=128, radix2_exp=11, samplate=SR, slide_length=512,
                 scale_type=SpectralFilterBankScaleType.MEL,
                 data_type=SpectralDataType.POWER)
spec_arr = np.abs(np.asarray(bft_obj.bft(x)))
n_time = spec_arr.shape[-1]
onset_obj = af.Onset(time_length=n_time, fre_length=128, slide_length=512,
                     samplate=SR, novelty_type=NoveltyType.FLUX)
point_arr, evn_arr, time_arr = onset_obj.onset(spec_arr)
print("onsets at:", np.asarray(time_arr)[np.asarray(point_arr) >= 0
                                         ][:4] if len(np.asarray(point_arr))
      else [], "s")
print("onset frames:", np.asarray(point_arr)[:8])
