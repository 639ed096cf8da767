from audioflux_tpu.display.display import fill_plot, fill_spec, fill_wave
from audioflux_tpu.display.plot import Plot
