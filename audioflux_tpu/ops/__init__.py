from audioflux_tpu.ops.window import get_window, get_fft_window
from audioflux_tpu.ops.frame import cal_time_length, cal_data_length, frame_signal
from audioflux_tpu.ops.pad import pad_signal
