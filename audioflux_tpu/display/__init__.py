from audioflux_tpu.display.display import fill_plot, fill_spec, fill_wave
from audioflux_tpu.display.plot import Plot


def __getattr__(name):
    if name in ("TimeFormatter", "ChromaFormatter"):
        from audioflux_tpu.display import display as _display
        return getattr(_display, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
