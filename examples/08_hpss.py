"""Harmonic/percussive separation, median and NMF variants ("HPSS")."""
import _util  # noqa: F401  (first: CPU forcing for CI)
from _util import SR, sample_220
import numpy as np
import audioflux_tpu as af

rng = np.random.default_rng(0)
x = sample_220(1.0)
clicks = np.zeros_like(x)
clicks[8000:8064] = 0.8 * rng.standard_normal(64).astype(np.float32)
clicks[24000:24064] = 0.8 * rng.standard_normal(64).astype(np.float32)
x = x + clicks

hpss_obj = af.HPSS(radix2_exp=11, slide_length=512, h_order=21, p_order=31)
h_arr, p_arr = hpss_obj.hpss(x)
print("median  h/p energy:", float(np.sum(np.asarray(h_arr) ** 2)),
      float(np.sum(np.asarray(p_arr) ** 2)))

nmf_obj = af.HPSSNMF(radix2_exp=11, slide_length=512, k=8, max_iter=80)
h2, p2 = nmf_obj.hpss(x)
print("nmf     h/p energy:", float(np.sum(np.asarray(h2) ** 2)),
      float(np.sum(np.asarray(p2) ** 2)))
