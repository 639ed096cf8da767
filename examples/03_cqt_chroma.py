"""CQT + chroma (reference "CQT & Chroma")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220, maybe_save, plotting
import numpy as np
import audioflux_tpu as af

audio_arr = sample_220()
cqt_obj = af.CQT(num=84, samplate=SR, slide_length=1024)
cqt_arr = cqt_obj.cqt(audio_arr)
chroma_cqt_arr = cqt_obj.chroma(cqt_arr)
print("cqt:", np.asarray(cqt_arr).shape,
      "chroma:", np.asarray(chroma_cqt_arr).shape)

if plotting():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from audioflux_tpu.display import fill_spec
    fig, ax = plt.subplots()
    fill_spec(np.abs(np.asarray(chroma_cqt_arr)), axes=ax,
              x_axis="time", title="Chroma-CQT")
    maybe_save(fig, "03_chroma_cqt")
