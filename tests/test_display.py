"""Display-layer parity: axis scales, coordinate handling, formatters.

Mirrors ``python/audioflux/display/display.py`` behavior: symlog base-2
'log' axis, adaptive time tick labels, chroma pitch-class ticks at the
diatonic degrees, reference limit semantics in fill_plot/fill_wave.
"""

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from audioflux_tpu.display import fill_plot, fill_spec, fill_wave


@pytest.fixture
def spec():
    rng = np.random.default_rng(0)
    return rng.random((24, 40)).astype(np.float32)


def test_fill_spec_coords_and_limits(spec):
    fig, ax = plt.subplots()
    x = np.linspace(0.0, 2.0, spec.shape[1] + 1)
    y = np.linspace(0.0, 16000.0, spec.shape[0] + 1)
    img = fill_spec(spec, axes=ax, x_coords=x, y_coords=y,
                    x_axis="time", y_axis="log", title="t")
    assert img.get_array().size == spec.size
    assert ax.get_xlim() == (0.0, 2.0)
    assert ax.get_ylim() == (0.0, 16000.0)
    assert ax.get_yscale() == "symlog"
    assert ax.get_title() == "t"
    plt.close(fig)


def test_fill_spec_time_formatter_minutes(spec):
    fig, ax = plt.subplots()
    x = np.linspace(0.0, 90.0, spec.shape[1] + 1)  # > 60 s: m:ss labels
    fill_spec(spec, axes=ax, x_coords=x, x_axis="time")
    fig.canvas.draw()
    labels = [t.get_text() for t in ax.get_xticklabels()]
    assert any(":" in s for s in labels), labels
    assert ax.xaxis.get_label_text() == "Time"
    plt.close(fig)


def test_fill_spec_chroma_axis():
    fig, ax = plt.subplots()
    data = np.random.default_rng(1).random((12, 8)).astype(np.float32)
    fill_spec(data, axes=ax, y_axis="chroma")
    fig.canvas.draw()
    labels = [t.get_text() for t in ax.get_yticklabels()]
    assert "C" in labels and "G" in labels, labels
    assert ax.yaxis.get_label_text() == "Pitch class"
    plt.close(fig)
    # non-multiple-of-12 chroma bins rejected
    fig, ax = plt.subplots()
    with pytest.raises(ValueError):
        fill_spec(np.zeros((13, 4)), axes=ax, y_axis="chroma")
    plt.close(fig)


def test_fill_spec_complex_warns(spec):
    fig, ax = plt.subplots()
    with pytest.warns(UserWarning):
        fill_spec(spec.astype(np.complex64), axes=ax)
    plt.close(fig)


def test_fill_plot_limits():
    fig, ax = plt.subplots()
    x = np.linspace(0, 1, 50)
    y = np.sin(2 * np.pi * x).astype(np.float32)
    fill_plot(x, y, axes=ax, label="sine")
    lo, hi = ax.get_ylim()
    blank = (y.max() - y.min()) * 0.15
    np.testing.assert_allclose([lo, hi],
                               [y.min() - blank, y.max() + blank],
                               rtol=1e-5)
    assert ax.get_xlim() == (0.0, 1.0)
    plt.close(fig)


def test_fill_wave_seconds_axis():
    fig, ax = plt.subplots()
    x = np.sin(np.linspace(0, 20, 3200)).astype(np.float32)
    fill_wave(x, samplate=32000, axes=ax)
    assert ax.get_xlim() == (0.0, (3200 - 1) / 32000)
    plt.close(fig)


def test_fill_rejects_bad_ndim():
    fig, ax = plt.subplots()
    with pytest.raises(ValueError):
        fill_spec(np.zeros((2, 3, 4)), axes=ax)
    with pytest.raises(ValueError):
        fill_wave(np.zeros((2, 3)), axes=ax)
    with pytest.raises(ValueError):
        fill_plot(np.zeros((2, 2)), np.zeros(2), axes=ax)
    plt.close(fig)
