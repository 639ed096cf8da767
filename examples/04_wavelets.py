"""Wavelet family: DWT / WPT / SWT decompositions ("Different Wavelet Type")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import sample_220
import numpy as np
import audioflux_tpu as af
from audioflux_tpu.types import WaveletDiscreteType

x = sample_220()[:4096]
for wt in (WaveletDiscreteType.DB, WaveletDiscreteType.SYM,
           WaveletDiscreteType.COIF):
    dwt = af.DWT(num=4, radix2_exp=12, wavelet_type=wt,
                 t1=4 if wt != WaveletDiscreteType.COIF else 2)
    coef_arr, m_data_arr = dwt.dwt(x)
    print(wt.name, np.asarray(coef_arr).shape, np.asarray(m_data_arr).shape)
wpt = af.WPT(num=3, radix2_exp=12)
coef_arr, m_data_arr = wpt.wpt(x)
print("wpt:", np.asarray(coef_arr).shape, np.asarray(m_data_arr).shape)
swt = af.SWT(num=3, fft_length=4096)
coef_arr, m_data_arr = swt.swt(x)
print("swt:", np.asarray(coef_arr).shape, np.asarray(m_data_arr).shape)
