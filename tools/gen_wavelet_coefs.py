"""Extract the discrete-wavelet filter coefficient tables into an .npz.

The decomposition/reconstruction lo/hi filters for haar, db2-40, sym2-30,
coif1-5, fk4-22, bior1.1-6.8 and dmey are standard published constants
(the same tables PyWavelets ships). We read them out of the built reference
library (dwt_filterCoef, src/filterbank/dwt_filterCoef.h) once and store
them as data in audioflux_tpu/filterbank/data/dwt_coef.npz.

Usage: python tools/gen_wavelet_coefs.py
"""

import ctypes
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_LIB = os.path.join(ROOT, ".ref", "libaudioflux.so")
OUT = os.path.join(ROOT, "audioflux_tpu", "filterbank", "data",
                   "dwt_coef.npz")

# (WaveletDiscreteType enum value, t1, t2, name)
CASES = [(0, 0, 0, "haar")]
CASES += [(1, t, 0, f"db{t}") for t in list(range(2, 11)) + [20, 30, 40]]
CASES += [(2, t, 0, f"sym{t}") for t in list(range(2, 11)) + [20, 30]]
CASES += [(3, t, 0, f"coif{t}") for t in range(1, 6)]
CASES += [(4, t, 0, f"fk{t}") for t in (4, 6, 8, 14, 18, 22)]
CASES += [(5, a, b, f"bior{a}.{b}") for (a, b) in
          [(1, 1), (1, 3), (1, 5), (2, 2), (2, 4), (2, 6), (2, 8),
           (3, 1), (3, 3), (3, 5), (3, 7), (3, 9), (4, 4), (5, 5), (6, 8)]]
CASES += [(6, 0, 0, "dmey")]


def main():
    lib = ctypes.cdll.LoadLibrary(REF_LIB)
    fn = lib["dwt_filterCoef"]
    fn.restype = ctypes.c_int
    out = {}
    for (wt, t1, t2, name) in CASES:
        for coef_type, tag in ((0, "d"), (1, "r")):
            lo = ctypes.POINTER(ctypes.c_float)()
            hi = ctypes.POINTER(ctypes.c_float)()
            n = fn(ctypes.c_int(wt), ctypes.c_int(t1), ctypes.c_int(t2),
                   ctypes.c_int(coef_type),
                   ctypes.byref(lo), ctypes.byref(hi))
            if n <= 0:
                raise RuntimeError(f"{name} {tag}: length {n}")
            out[f"{name}_lo_{tag}"] = np.ctypeslib.as_array(lo, (n,)).copy()
            out[f"{name}_hi_{tag}"] = np.ctypeslib.as_array(hi, (n,)).copy()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays, "
          f"{len(CASES)} wavelets")


if __name__ == "__main__":
    main()
