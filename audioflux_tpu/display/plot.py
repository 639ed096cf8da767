"""Grid plot helper mirroring ``python/audioflux/display/plot.py:39``."""

from __future__ import annotations

import numpy as np

__all__ = ["Plot"]


class Plot:
    """Row-stacked subplot grid with shared x-axis."""

    def __init__(self, nrows=1, ncols=1, sharex=False, sharey=False,
                 fig_width=8, fig_height=2.5):
        import matplotlib.pyplot as plt
        self.fig, axes = plt.subplots(
            nrows, ncols, sharex=sharex, sharey=sharey,
            figsize=(fig_width * ncols, fig_height * nrows))
        self.axes = np.atleast_1d(axes)
        self._idx = 0

    def _next_axes(self):
        ax = self.axes.flat[self._idx % self.axes.size]
        self._idx += 1
        return ax

    def add_spec_data(self, data, x_coords=None, y_coords=None, scale=None,
                      title=None):
        from audioflux_tpu.display.display import fill_spec
        return fill_spec(data, axes=self._next_axes(), x_coords=x_coords,
                         y_coords=y_coords,
                         y_axis=scale, title=title)

    def add_wave_data(self, data, samplate=32000, title=None):
        from audioflux_tpu.display.display import fill_wave
        return fill_wave(data, samplate=samplate, axes=self._next_axes(),
                         title=title)

    def add_plot_data(self, y, x=None, label=None, title=None):
        from audioflux_tpu.display.display import fill_plot
        if x is None:
            x = np.arange(np.asarray(y).shape[-1])
        return fill_plot(x, y, axes=self._next_axes(), label=label,
                         title=title)

    def show(self):
        import matplotlib.pyplot as plt
        plt.show()

    def save(self, path, dpi=100):
        self.fig.savefig(path, dpi=dpi, bbox_inches="tight")
