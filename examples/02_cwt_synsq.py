"""CWT + synchrosqueezing (reference "CWT & Synchrosqueezing")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220, maybe_save, plotting
import numpy as np
import audioflux_tpu as af
from audioflux_tpu.types import SpectralFilterBankScaleType, WaveletContinueType

audio_arr = sample_220(0.3)
N = 4096
cwt_obj = af.CWT(num=84, radix2_exp=12, samplate=SR,
                 wavelet_type=WaveletContinueType.MORSE,
                 scale_type=SpectralFilterBankScaleType.OCTAVE)
cwt_spec = cwt_obj.cwt(audio_arr[:N])
sync_obj = af.Synsq(num=84, radix2_exp=12, samplate=SR)
sync_spec = sync_obj.synsq(cwt_spec,
                           SpectralFilterBankScaleType.OCTAVE,
                           cwt_obj.get_fre_band_arr())
print("cwt:", np.asarray(cwt_spec).shape, "synsq:",
      np.asarray(sync_spec).shape)

if plotting():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from audioflux_tpu.display import fill_spec
    fig, ax = plt.subplots()
    fill_spec(np.abs(np.asarray(sync_spec)), axes=ax, title="Synsq")
    maybe_save(fig, "02_synsq")
