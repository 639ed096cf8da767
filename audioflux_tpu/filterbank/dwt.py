"""Discrete-wavelet filter coefficient tables.

Loaded from ``data/dwt_coef.npz`` (standard published constants — haar,
db2-40, sym2-30, coif1-5, fk4-22, bior1.1-6.8, dmey — the same tables
PyWavelets ships; see tools/gen_wavelet_coefs.py for provenance). Mirrors
``dwt_filterCoef`` (src/filterbank/dwt_filterCoef.h).
"""

from __future__ import annotations

import os

import numpy as np

from audioflux_tpu.types import WaveletDiscreteType

__all__ = ["wavelet_coef", "wavelet_name"]

_DATA = None


def _load():
    global _DATA
    if _DATA is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "dwt_coef.npz")
        _DATA = dict(np.load(path))
    return _DATA


def wavelet_name(wavelet_type, t1: int = 4, t2: int = 0) -> str:
    W = WaveletDiscreteType(wavelet_type)
    if W == WaveletDiscreteType.HAAR:
        return "haar"
    if W == WaveletDiscreteType.DB:
        return f"db{t1}"
    if W == WaveletDiscreteType.SYM:
        return f"sym{t1}"
    if W == WaveletDiscreteType.COIF:
        return f"coif{t1}"
    if W == WaveletDiscreteType.FK:
        return f"fk{t1}"
    if W == WaveletDiscreteType.BIOR:
        return f"bior{t1}.{t2}"
    if W == WaveletDiscreteType.DMEY:
        return "dmey"
    raise ValueError(f"unsupported wavelet {wavelet_type!r}")


def wavelet_coef(wavelet_type, t1: int = 4, t2: int = 0,
                 coef_type: int = 0):
    """(lo, hi) float32 filters; coef_type 0 decomposition, 1 reconstruction."""
    name = wavelet_name(wavelet_type, t1, t2)
    data = _load()
    tag = "d" if coef_type == 0 else "r"
    key = f"{name}_lo_{tag}"
    if key not in data:
        raise ValueError(f"unsupported wavelet spec {name}")
    return data[key].copy(), data[f"{name}_hi_{tag}"].copy()
