"""Mel spectrogram + MFCC (reference docs/examples.md "Mel & MFCC")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220, maybe_save, plotting
import numpy as np
import audioflux_tpu as af

audio_arr = sample_220()
spec_arr, mel_fre_band_arr = af.mel_spectrogram(
    audio_arr, num=128, radix2_exp=12, samplate=SR)
spec_arr = np.abs(np.asarray(spec_arr))
mfcc_arr, _ = af.mfcc(audio_arr, cc_num=13, mel_num=128, radix2_exp=12,
                      samplate=SR)
print("mel:", spec_arr.shape, "mfcc:", np.asarray(mfcc_arr).shape)

if plotting():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from audioflux_tpu.display import fill_spec
    x_coords = np.linspace(0, audio_arr.shape[-1] / SR, spec_arr.shape[-1] + 1)
    y_coords = np.insert(np.asarray(mel_fre_band_arr), 0, 0)
    fig, ax = plt.subplots()
    fill_spec(af.utils.power_to_db(spec_arr ** 2), axes=ax,
              x_coords=x_coords, y_coords=y_coords,
              x_axis="time", y_axis="log", title="Mel Spectrogram")
    maybe_save(fig, "01_mel")
