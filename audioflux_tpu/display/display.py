"""Matplotlib helpers mirroring ``python/audioflux/display/display.py``.

``fill_spec`` draws a (fre, time) spectrogram, ``fill_wave`` a waveform and
``fill_plot`` a labeled line plot. Imports matplotlib lazily so headless
feature extraction never pays for it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fill_spec", "fill_plot", "fill_wave"]


def _axes(axes):
    import matplotlib.pyplot as plt
    if axes is None:
        _, axes = plt.subplots()
    return axes


def fill_spec(data, axes=None, x_coords=None, y_coords=None,
              x_axis="time", y_axis="fre", title=None, cmap="plasma"):
    """Render a (fre, time) matrix; returns the QuadMesh image."""
    data = np.asarray(data)
    if np.iscomplexobj(data):
        data = np.abs(data)
    axes = _axes(axes)
    if x_coords is None:
        x_coords = np.arange(data.shape[-1] + 1)
    if y_coords is None:
        y_coords = np.arange(data.shape[-2] + 1)
    nx = min(len(x_coords), data.shape[-1] + 1)
    ny = min(len(y_coords), data.shape[-2] + 1)
    img = axes.pcolormesh(x_coords[:nx], y_coords[:ny],
                          data[:ny - 1, :nx - 1], cmap=cmap, shading="auto")
    if x_axis == "time":
        axes.set_xlabel("Time (s)")
    if y_axis == "fre":
        axes.set_ylabel("Frequency (Hz)")
    elif y_axis == "log":
        axes.set_yscale("symlog", linthresh=100)
        axes.set_ylabel("Frequency (Hz)")
    if title:
        axes.set_title(title)
    return img


def fill_wave(data, samplate=32000, axes=None, title=None):
    """Render a waveform against seconds."""
    data = np.asarray(data)
    axes = _axes(axes)
    t = np.arange(data.shape[-1]) / samplate
    axes.plot(t, data, linewidth=0.7)
    axes.set_xlabel("Time (s)")
    axes.set_ylabel("Amplitude")
    if title:
        axes.set_title(title)
    return axes


def fill_plot(x, y, axes=None, label=None, is_legend=True, title=None):
    """Render a labeled line plot."""
    axes = _axes(axes)
    axes.plot(np.asarray(x), np.asarray(y), label=label)
    if label and is_legend:
        axes.legend()
    if title:
        axes.set_title(title)
    return axes
