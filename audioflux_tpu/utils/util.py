"""Misc utilities: audio validation, channel reshaping, f0 synthesis.

Reference ``python/audioflux/utils/util.py`` + ``src/util/flux_util.c``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["check_audio", "format_channel", "revoke_channel", "synth_f0"]


def check_audio(x, is_mono: bool = True) -> bool:
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.floating):
        raise ValueError(f"audio dtype must be floating, got {x.dtype}")
    if is_mono and x.ndim != 1:
        raise ValueError("audio must be mono (1-D)")
    return True


def format_channel(x: np.ndarray, last_dims: int):
    """Collapse leading dims into one channel axis; returns (x2, lead_shape)."""
    shape = x.shape
    lead = shape[:-last_dims] if last_dims else shape
    tail = shape[len(lead):]
    return x.reshape((-1,) + tail), lead


def revoke_channel(x: np.ndarray, lead_shape, last_dims: int):
    return x.reshape(tuple(lead_shape) + x.shape[1:])


def synth_f0(times, frequencies, samplate: int, amplitudes=None):
    """Synthesize audio following an f0 trajectory
    (util_synthF0, flux_util.c:829-870): linear interp of frequency (and
    amplitude) onto the sample grid, cumulative phase, sine."""
    times = np.asarray(times, np.float64)
    freqs = np.asarray(frequencies, np.float64)
    n = int(np.floor(times[-1] * samplate))
    t_samples = times * samplate
    w = freqs * (2 * np.pi / samplate)
    grid = np.arange(n)
    w_i = np.interp(grid, t_samples, w)
    if amplitudes is not None:
        a_i = np.interp(grid, t_samples, np.asarray(amplitudes, np.float64))
    else:
        a_i = 1.0
    phase = np.cumsum(w_i)
    return (np.sin(phase) * a_i).astype(np.float32)
